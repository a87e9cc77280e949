"""Multi-chip SPMD: sharded train step on an 8-device host mesh (dp=4 x
tp=2). The reference never tests multi-node (SURVEY.md section 4); here the
sharded step must (a) run, (b) match the single-device step numerically."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoregressive_diffusion_tpu.models import Precond, UNetConfig
from autoregressive_diffusion_tpu.parallel import (batch_sharding,
                                                   create_mesh,
                                                   param_sharding,
                                                   replicated,
                                                   shard_train_state)
from autoregressive_diffusion_tpu.train import (EDM2LossConfig,
                                                create_train_state,
                                                make_optimizer,
                                                make_train_step)

CFG = UNetConfig(img_resolution=8, img_channels=4, label_dim=0,
                 model_channels=16, channel_mult=(1, 2), num_blocks=1,
                 video_attn_resolutions=(4,), frame_attn_resolutions=(8,),
                 channels_per_head=16, max_frames=8)
B, T = 8, 2


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 host devices"
    model = Precond(CFG, sigma_data=1.0)
    x = jnp.zeros((B, 2 * T, 8, 8, 4))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.ones((B, 2 * T)),
                           mode="train")
    tx = make_optimizer(learning_rate=1e-3)
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, EDM2LossConfig(), tx, batch_size=B)
    return model, tx, state, step


def test_sharded_step_matches_single_device(setup):
    model, tx, state, step = setup
    images = jax.random.normal(jax.random.PRNGKey(1), (B, T, 8, 8, 4))
    key = jax.random.PRNGKey(2)

    # single-device baseline
    ref_state, ref_metrics = jax.jit(step, static_argnames=("just_2d",))(
        state, images, None, key)

    # dp=4 x tp=2 mesh
    mesh = create_mesh(tp=2)
    assert dict(mesh.shape) == {"replica": 1, "data": 4, "seq": 1, "model": 2}
    sharded_state, state_shardings = shard_train_state(state, mesh,
                                                       min_shard_size=32)
    # at least one weight is actually split over 'model'
    p = sharded_state.params["unet"]["enc_8x8_block0"]["attn"]["attn_qkv"]["w"]
    assert not p.sharding.is_fully_replicated

    images_s = jax.device_put(images, batch_sharding(mesh))
    step_j = jax.jit(step, static_argnames=("just_2d",),
                     in_shardings=(state_shardings, batch_sharding(mesh),
                                   None, replicated(mesh)),
                     out_shardings=(state_shardings, None))
    new_state, metrics = step_j(sharded_state, images_s, None,
                                jax.device_put(key, replicated(mesh)))

    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=2e-4)
    # updated params agree with the single-device step
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     new_state.params, ref_state.params)
    assert max(jax.tree.leaves(d)) < 2e-4


def test_multislice_mesh_step_matches_single_device(setup):
    """2 slices x dp=2 x tp=2: the 'replica' (DCN) axis carries pure data
    parallelism; the step must agree with the single-device result. The
    reference has no multi-slice story at all (DDP within one NCCL world,
    SURVEY.md section 2.7)."""
    model, tx, state, step = setup
    images = jax.random.normal(jax.random.PRNGKey(1), (B, T, 8, 8, 4))
    key = jax.random.PRNGKey(2)
    ref_state, ref_metrics = jax.jit(step, static_argnames=("just_2d",))(
        state, images, None, key)

    mesh = create_mesh(tp=2, num_slices=2)
    assert dict(mesh.shape) == {"replica": 2, "data": 2, "seq": 1, "model": 2}
    sharded_state, state_shardings = shard_train_state(state, mesh,
                                                       min_shard_size=32)
    images_s = jax.device_put(images, batch_sharding(mesh))
    # the batch is split over replica x data (8 ways total)
    assert images_s.sharding.spec == jax.sharding.PartitionSpec(
        ("replica", "data"))
    step_j = jax.jit(step, static_argnames=("just_2d",),
                     in_shardings=(state_shardings, batch_sharding(mesh),
                                   None, replicated(mesh)),
                     out_shardings=(state_shardings, None))
    new_state, metrics = step_j(sharded_state, images_s, None,
                                jax.device_put(key, replicated(mesh)))
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=2e-4)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     new_state.params, ref_state.params)
    assert max(jax.tree.leaves(d)) < 2e-4


def test_fsdp_step_matches_single_device(setup):
    """dp=4 x tp=2 with fsdp=True: every large weight (and its Adam moments,
    which follow the param sharding) is additionally split over 'data' --
    ZeRO-style fully-sharded data parallelism; XLA all-gathers weights
    just-in-time and reduce-scatters their gradients. The step must agree
    numerically with the single-device step. Beyond-reference capability
    (the reference DDP replicates params/optimizer on every rank,
    cs_train.py:53-54)."""
    model, tx, state, step = setup
    images = jax.random.normal(jax.random.PRNGKey(1), (B, T, 8, 8, 4))
    key = jax.random.PRNGKey(2)
    ref_state, ref_metrics = jax.jit(step, static_argnames=("just_2d",))(
        state, images, None, key)

    mesh = create_mesh(tp=2)
    sharded_state, state_shardings = shard_train_state(
        state, mesh, min_shard_size=32, fsdp=True, fsdp_min_size=256)
    # at least one weight is split over BOTH 'data' and 'model'
    specs = [s.spec for s in jax.tree.leaves(state_shardings.params)]
    assert any("data" in s and "model" in s for s in specs), specs
    # Adam moments carry the same fsdp sharding as their params
    ospecs = [s.spec for s in jax.tree.leaves(state_shardings.opt_state)
              if hasattr(s, "spec")]
    assert any("data" in s for s in ospecs), ospecs

    images_s = jax.device_put(images, batch_sharding(mesh))
    step_j = jax.jit(step, static_argnames=("just_2d",),
                     in_shardings=(state_shardings, batch_sharding(mesh),
                                   None, replicated(mesh)),
                     out_shardings=(state_shardings, None))
    new_state, metrics = step_j(sharded_state, images_s, None,
                                jax.device_put(key, replicated(mesh)))
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=2e-4)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     new_state.params, ref_state.params)
    assert max(jax.tree.leaves(d)) < 2e-4


def test_param_sharding_rule_fsdp():
    mesh = create_mesh(tp=2)  # dp=4
    params = {"a": {"w": jnp.zeros((3, 3, 16, 64))},
              "tiny": {"w": jnp.zeros((8, 8))}}
    sh = param_sharding(mesh, params, min_shard_size=32,
                        fsdp=True, fsdp_min_size=256)
    # largest free axis divisible by dp=4 is cin=16 (last axis holds 'model')
    assert sh["a"]["w"].spec == jax.sharding.PartitionSpec(
        None, None, "data", "model")
    # below fsdp_min_size: 'data' not applied
    assert sh["tiny"]["w"].spec == jax.sharding.PartitionSpec()


def test_gather_to_host_roundtrips_fsdp_state(setup):
    """gather_to_host must return plain numpy equal to the original values
    for an FSDP-sharded state (the checkpoint path for --fsdp runs), and
    check_replica_consistency must run on sharded params without error."""
    from autoregressive_diffusion_tpu.parallel import (
        check_replica_consistency, gather_to_host)
    model, tx, state, step = setup
    mesh = create_mesh(tp=2)
    sharded_state, _ = shard_train_state(
        state, mesh, min_shard_size=32, fsdp=True, fsdp_min_size=256)
    host = gather_to_host(sharded_state)
    for a, b in zip(jax.tree.leaves(host), jax.tree.leaves(state)):
        assert isinstance(a, np.ndarray) or np.isscalar(a)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert check_replica_consistency(sharded_state.params) == []


def test_param_sharding_rule():
    mesh = create_mesh(tp=2)
    params = {"a": {"w": jnp.zeros((3, 3, 16, 64))},
              "g": jnp.zeros(()),
              "small": {"w": jnp.zeros((4, 2))}}
    sh = param_sharding(mesh, params, min_shard_size=32)
    assert sh["a"]["w"].spec == jax.sharding.PartitionSpec(None, None, None, "model")
    assert sh["g"].spec == jax.sharding.PartitionSpec()
    assert sh["small"]["w"].spec == jax.sharding.PartitionSpec()


def test_seq_sharded_step_matches_single_device(setup):
    """dp=2 x sp=2 x tp=2: the frame axis of activations is sharded over
    'seq' (sequence parallelism -- XLA partitions per-frame work locally and
    inserts the video-attention K/V collectives). Must agree numerically
    with the single-device step. Beyond-reference capability (the reference
    is DDP-only, cs_train.py:53-54)."""
    from autoregressive_diffusion_tpu.parallel import seq_sharding
    model, tx, state, step = setup
    images = jax.random.normal(jax.random.PRNGKey(1), (B, T, 8, 8, 4))
    key = jax.random.PRNGKey(2)
    ref_state, ref_metrics = jax.jit(step, static_argnames=("just_2d",))(
        state, images, None, key)

    mesh = create_mesh(tp=2, sp=2)
    assert dict(mesh.shape) == {"replica": 1, "data": 2, "seq": 2, "model": 2}
    sharded_state, state_shardings = shard_train_state(state, mesh,
                                                       min_shard_size=32)
    images_s = jax.device_put(images, seq_sharding(mesh))
    assert images_s.sharding.spec == jax.sharding.PartitionSpec(
        ("replica", "data"), "seq")
    step_j = jax.jit(step, static_argnames=("just_2d",),
                     in_shardings=(state_shardings, seq_sharding(mesh),
                                   None, replicated(mesh)),
                     out_shardings=(state_shardings, None))
    new_state, metrics = step_j(sharded_state, images_s, None,
                                jax.device_put(key, replicated(mesh)))
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=2e-4)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     new_state.params, ref_state.params)
    assert max(jax.tree.leaves(d)) < 2e-4


def test_sp_context_routes_video_attention_through_sp_kernel():
    """With an SP context installed, VideoAttention's train path runs the
    sequence-parallel splash kernel (shard_map over the 'seq' axis) and the
    sharded step still matches the single-device dense step. Config sized so
    S = 2*T*hw = 256 tiles the sp=2 x 128-row splash grid."""
    from autoregressive_diffusion_tpu.ops import flash_attention as fa
    from autoregressive_diffusion_tpu.parallel import (seq_sharding,
                                                       set_sp_context)

    cfg = UNetConfig(img_resolution=8, img_channels=4, label_dim=0,
                     model_channels=16, channel_mult=(1, 2), num_blocks=1,
                     video_attn_resolutions=(8,), frame_attn_resolutions=(),
                     channels_per_head=16, max_frames=8)
    model = Precond(cfg, sigma_data=1.0)
    b, t = 4, 2
    x0 = jnp.zeros((b, 2 * t, 8, 8, 4))
    variables = model.init(jax.random.PRNGKey(0), x0, jnp.ones((b, 2 * t)),
                           mode="train")
    tx = make_optimizer(learning_rate=1e-3)
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, EDM2LossConfig(), tx, batch_size=b)
    images = jax.random.normal(jax.random.PRNGKey(1), (b, t, 8, 8, 4))
    key = jax.random.PRNGKey(2)

    ref_state, ref_metrics = jax.jit(step, static_argnames=("just_2d",))(
        state, images, None, key)

    mesh = create_mesh(tp=2, sp=2)
    try:
        set_sp_context(mesh, interpret=True)
        ok, *_ = fa.sp_flash_supported(2 * t * 64, 1)
        assert ok, "SP gate must accept S=256 on the sp=2 mesh"
        sharded_state, shardings = shard_train_state(state, mesh,
                                                     min_shard_size=32)
        step_j = jax.jit(step, static_argnames=("just_2d",),
                         in_shardings=(shardings, seq_sharding(mesh),
                                       None, replicated(mesh)),
                         out_shardings=(shardings, None))
        new_state, metrics = step_j(
            sharded_state, jax.device_put(images, seq_sharding(mesh)), None,
            jax.device_put(key, replicated(mesh)))
        np.testing.assert_allclose(float(metrics["loss"]),
                                   float(ref_metrics["loss"]), rtol=2e-4)
        d = jax.tree.map(lambda a, c: float(jnp.abs(a - c).max()),
                         new_state.params, ref_state.params)
        assert max(jax.tree.leaves(d)) < 2e-4
    finally:
        set_sp_context(None)

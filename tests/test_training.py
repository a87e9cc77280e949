"""Training stack: EDM2 loss semantics, LR schedule golden values,
MultiNoiseLoss fit round-trip, power-function EMA math, forced weight norm,
and a full train step (params change, loss finite, EMA tracks)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoregressive_diffusion_tpu.models import Precond, UNetConfig
from autoregressive_diffusion_tpu.train import (
    EDM2LossConfig, MultiNoiseState, TrainState, create_train_state,
    edm2_loss, fourier_eval, forced_weight_norm, init_coefs,
    learning_rate_schedule, make_optimizer, make_train_step, std_to_exp,
    exp_to_std)

CFG = UNetConfig(img_resolution=8, img_channels=4, label_dim=3,
                 model_channels=16, channel_mult=(1, 2), num_blocks=1,
                 video_attn_resolutions=(4,), frame_attn_resolutions=(8,),
                 channels_per_head=16, max_frames=8)
B, T = 2, 4


@pytest.fixture(scope="module")
def setup():
    model = Precond(CFG, sigma_data=1.0)
    x = jnp.zeros((B, 2 * T, 8, 8, 4))
    sigma = jnp.ones((B, 2 * T))
    cond = jnp.zeros((B, 2 * T), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, sigma, cond, mode="train")
    return model, variables


def test_learning_rate_schedule_golden():
    # reference loss.py:63-69
    assert float(learning_rate_schedule(500, 1e-2, 7e4, 1e3)) == pytest.approx(5e-3)
    assert float(learning_rate_schedule(1000, 1e-2, 7e4, 1e3)) == pytest.approx(1e-2)
    assert float(learning_rate_schedule(280000, 1e-2, 7e4, 1e3)) == pytest.approx(5e-3)


def test_std_exp_roundtrip():
    for std in (0.05, 0.1, 0.2):
        assert float(exp_to_std(std_to_exp(std))) == pytest.approx(std, rel=1e-6)


def test_fourier_fit_roundtrip():
    """Fitting noisy samples of a smooth log-log curve recovers it."""
    rng = np.random.default_rng(0)
    sigmas = 10 ** rng.uniform(-1, 1, size=(64, 32)).astype(np.float32)
    true = lambda s: 0.5 + 0.3 * np.cos(np.log10(s)) + 0.1 * np.sin(2 * np.log10(s))
    losses = 10 ** true(sigmas) * 10 ** rng.normal(0, 0.01, sigmas.shape)
    st = MultiNoiseState()
    st.add_data(sigmas, losses)
    coefs = jnp.asarray(st.fit())
    test_s = jnp.asarray(10 ** np.linspace(-0.9, 0.9, 50, dtype=np.float32))
    pred = np.log10(np.asarray(fourier_eval(coefs, test_s)))
    np.testing.assert_allclose(pred, true(np.asarray(test_s)), atol=0.02)


def test_fourier_eval_zero_coefs_is_one():
    s = jnp.asarray([0.1, 1.0, 10.0])
    np.testing.assert_allclose(np.asarray(fourier_eval(init_coefs(), s)), 1.0)


def test_edm2_loss_shapes_and_context_sigma(setup):
    model, variables = setup
    cfg = EDM2LossConfig(P_mean=1.2, P_std=1.0, sigma_data=1.0,
                         context_noise_reduction=0.5)
    images = jax.random.normal(jax.random.PRNGKey(1), (B, T, 8, 8, 4))
    cond = jnp.zeros((B, T), jnp.int32)
    loss, aux = edm2_loss(model, variables, images, jax.random.PRNGKey(2),
                          cfg, cond, init_coefs())
    assert np.isfinite(float(loss))
    assert aux["sigma"].shape == (B, T)
    assert aux["losses"].shape == (B, T)
    # just_2d path
    loss2, _ = edm2_loss(model, variables, images, jax.random.PRNGKey(3),
                         cfg, cond, init_coefs(), just_2d=True)
    assert np.isfinite(float(loss2))


def test_forced_weight_norm_unit_norms():
    params = {"a": {"w": jnp.ones((3, 3, 4, 8)) * 5.0},
              "emb_gain": jnp.float32(2.0)}
    out = forced_weight_norm(params)
    norms = np.linalg.norm(np.asarray(out["a"]["w"]).reshape(-1, 8), axis=0)
    np.testing.assert_allclose(norms, np.sqrt(3 * 3 * 4), rtol=1e-3)
    assert float(out["emb_gain"]) == 2.0  # untouched


def test_train_step_updates(setup):
    model, variables = setup
    tx = make_optimizer(learning_rate=1e-3)
    state = create_train_state(model, variables, tx)
    step_fn = jax.jit(
        make_train_step(model, EDM2LossConfig(P_mean=1.2, P_std=1.0,
                                              context_noise_reduction=0.5),
                        tx, batch_size=B),
        static_argnames=("just_2d",))

    images = jax.random.normal(jax.random.PRNGKey(4), (B, T, 8, 8, 4))
    cond = jnp.zeros((B, T), jnp.int32)
    new_state, metrics = step_fn(state, images, cond, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1

    # params changed, and all MP weights are unit-normalized after the step
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state.params, new_state.params)
    assert max(jax.tree.leaves(d)) > 0
    w = new_state.params["unet"]["enc_8x8_conv"]["w"]
    norms = np.linalg.norm(np.asarray(w).reshape(-1, w.shape[-1]), axis=0)
    np.testing.assert_allclose(norms, np.sqrt(w.size / w.shape[-1]), rtol=1e-3)

    # At step 1 beta = (1 - b/b)^(g+1) = 0: EMA must equal the new params
    # (up to lerp rounding e + (p-e)*1, reference phema.py:104-108).
    for e, p in zip(jax.tree.leaves(new_state.ema[0]),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(p),
                                   rtol=1e-6, atol=1e-7)

    # second step with just_2d
    new_state2, m2 = step_fn(new_state, images, cond, jax.random.PRNGKey(6),
                             just_2d=True)
    assert np.isfinite(float(m2["loss"]))
    assert int(new_state2.step) == 2

    # At step 2 beta = 0.5^(gamma+1): ema2 == beta*p1 + (1-beta)*p2, strictly
    # between the two wherever they differ.
    beta = 0.5 ** (float(std_to_exp(new_state2.ema_stds[0])) + 1.0)
    p1 = np.asarray(new_state.params["unet"]["out_gain"])
    p2 = np.asarray(new_state2.params["unet"]["out_gain"])
    e2 = np.asarray(new_state2.ema[0]["unet"]["out_gain"])
    assert p1 != p2  # the step moved this param
    np.testing.assert_allclose(e2, beta * p1 + (1 - beta) * p2,
                               rtol=1e-6, atol=1e-7)
    assert min(p1, p2) < e2 < max(p1, p2)


def test_train_step_microbatch_matches_full():
    """Gradient accumulation by lax.scan over microbatches must produce the
    SAME optimizer step as the full batch: sigma/noise are drawn from
    per-sample folded keys (loss.py `draw`), so slice j of the scan samples
    exactly what rows [j*m,(j+1)*m) of the full batch sample."""
    model = Precond(CFG, sigma_data=1.0)
    x = jnp.zeros((4, 2 * T, 8, 8, 4))
    sigma = jnp.ones((4, 2 * T))
    cond = jnp.zeros((4, 2 * T), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, sigma, cond, mode="train")
    tx = make_optimizer(learning_rate=1e-3)
    lcfg = EDM2LossConfig()
    images = jax.random.normal(jax.random.PRNGKey(7), (4, T, 8, 8, 4))
    cnd = jnp.zeros((4, T), jnp.int32)
    key = jax.random.PRNGKey(8)

    step_micro = jax.jit(make_train_step(model, lcfg, tx, batch_size=4,
                                         microbatch=2),
                         static_argnames=("just_2d",))
    step_full = jax.jit(make_train_step(model, lcfg, tx, batch_size=4),
                        static_argnames=("just_2d",))
    s_micro, m_micro = step_micro(create_train_state(model, variables, tx),
                                  images, cnd, key)
    s_full, m_full = step_full(create_train_state(model, variables, tx),
                               images, cnd, key)

    assert m_micro["sigma"].shape == (4, T)
    np.testing.assert_allclose(np.asarray(m_micro["sigma"]),
                               np.asarray(m_full["sigma"]), rtol=1e-6)
    np.testing.assert_allclose(float(m_micro["unweighted"]),
                               float(m_full["unweighted"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s_micro.params),
                    jax.tree.leaves(s_full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_scanned_step_matches_sequential(setup):
    """make_scanned_train_step == g sequential make_train_step calls when
    the per-step keys match (scan uses jax.random.split(key, g))."""
    from autoregressive_diffusion_tpu.train import make_scanned_train_step

    model, variables = setup
    tx = make_optimizer(learning_rate=1e-3)
    lcfg = EDM2LossConfig()
    g = 2
    images = jax.random.normal(jax.random.PRNGKey(3), (g, B, T, 8, 8, 4))
    cond = jnp.zeros((g, B, T), jnp.int32)
    key = jax.random.PRNGKey(9)

    scanned = make_scanned_train_step(model, lcfg, tx, batch_size=B)
    s_scan, m_scan = jax.jit(scanned, static_argnames=("just_2d",))(
        create_train_state(model, variables, tx), images, cond, key)

    step = jax.jit(make_train_step(model, lcfg, tx, batch_size=B),
                   static_argnames=("just_2d",))
    s_seq = create_train_state(model, variables, tx)
    keys = jax.random.split(key, g)
    losses = []
    for i in range(g):
        s_seq, m = step(s_seq, images[i], cond[i], keys[i])
        losses.append(float(m["loss"]))

    assert int(s_scan.step) == g
    np.testing.assert_allclose(np.asarray(m_scan["loss_per_step"]),
                               np.asarray(losses), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s_scan.params),
                    jax.tree.leaves(s_seq.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_replay_step_matches_scanned(setup):
    """make_replay_train_step (on-device gather from a buffer by index) ==
    make_scanned_train_step on the pre-gathered batches."""
    from autoregressive_diffusion_tpu.train import (make_replay_train_step,
                                                    make_scanned_train_step)

    model, variables = setup
    tx = make_optimizer(learning_rate=1e-3)
    lcfg = EDM2LossConfig()
    g, cap = 2, 6
    buf_z = jax.random.normal(jax.random.PRNGKey(3), (cap, T, 8, 8, 4))
    buf_a = jnp.zeros((cap, T), jnp.int32)
    idx = jnp.asarray([[4, 0], [2, 5]], jnp.int32)  # (g, B)
    key = jax.random.PRNGKey(9)

    rstep = make_replay_train_step(model, lcfg, tx, batch_size=B)
    s_rep, m_rep = jax.jit(rstep, static_argnames=("just_2d",))(
        create_train_state(model, variables, tx), buf_z, buf_a, idx, key)

    scanned = make_scanned_train_step(model, lcfg, tx, batch_size=B)
    s_scan, m_scan = jax.jit(scanned, static_argnames=("just_2d",))(
        create_train_state(model, variables, tx), buf_z[idx], buf_a[idx], key)

    assert int(s_rep.step) == g
    assert m_rep["unweighted"].shape == (g,)  # per-step history entries
    np.testing.assert_allclose(np.asarray(m_rep["loss_per_step"]),
                               np.asarray(m_scan["loss_per_step"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s_rep.params),
                    jax.tree.leaves(s_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

"""Tests for infra utilities: 2D-checkpoint import, stats collector, misc.

The import test is the TPU equivalent of the reference's golden-weights
suite (/root/reference/test.py:19-91): instead of downloading the NVIDIA
pickle, it round-trips export_2d_state -> import_torch_edm2 and checks that
(a) all 2D-derivable weights land bit-exactly, and (b) a just_2d forward of
the imported model equals the original (the property test.py verifies
against the upstream 2D net).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoregressive_diffusion_tpu.models import Precond, UNetConfig
from autoregressive_diffusion_tpu.utils import (Collector, assert_shape,
                                                compare_caches,
                                                export_2d_state,
                                                find_nonfinite,
                                                import_torch_edm2, report,
                                                report0, tile_images)


@pytest.fixture(scope="module")
def tiny():
    cfg = UNetConfig(img_resolution=8, img_channels=3, label_dim=4,
                     model_channels=8, channel_mult=(1, 2), num_blocks=1,
                     video_attn_resolutions=(4,), frame_attn_resolutions=(8,),
                     channels_per_head=8, max_frames=8)
    model = Precond(cfg, sigma_data=0.5)
    b, t = 1, 2
    x = jnp.zeros((b, 2 * t, 8, 8, 3))
    sig = jnp.ones((b, 2 * t))
    cond = jnp.zeros((b, 2 * t), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, sig, cond, mode="train")
    return cfg, model, variables


class TestImport2D:
    def test_round_trip_exact(self, tiny):
        cfg, model, variables = tiny
        sd = export_2d_state(variables, cfg)
        assert any(k.endswith("conv_res0.weight") for k in sd)
        assert "out_gain" in sd and "emb_fourier.freqs" in sd
        # perturb every exported weight, then import: must land exactly.
        rng = np.random.default_rng(0)
        sd2 = {k: rng.normal(size=np.shape(v)).astype(np.float32)
               for k, v in sd.items()}
        imported = import_torch_edm2(variables, sd2, cfg)
        back = export_2d_state(imported, cfg)
        for k in sd2:
            np.testing.assert_array_equal(back[k], sd2[k], err_msg=k)

    def test_just_2d_forward_preserved(self, tiny):
        cfg, model, variables = tiny
        sd = export_2d_state(variables, cfg)
        imported = import_torch_edm2(variables, sd, cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 3))
        sig = jnp.full((1, 2), 0.8)
        cond = jnp.zeros((1, 2), jnp.int32)
        y0, _ = model.apply(variables, x, sig, cond, mode="eval", just_2d=True)
        y1, _ = model.apply(jax.tree.map(jnp.asarray, imported), x, sig, cond,
                            mode="eval", just_2d=True)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=1e-5, atol=1e-5)

    def test_shape_mismatch_raises(self, tiny):
        cfg, model, variables = tiny
        sd = export_2d_state(variables, cfg)
        k = next(k for k in sd if k.endswith("conv_res0.weight"))
        sd[k] = np.zeros((1, 1, 1, 1), np.float32)
        with pytest.raises(ValueError, match="shape mismatch"):
            import_torch_edm2(variables, sd, cfg)


class TestStats:
    def test_moments(self):
        c = Collector(regex="t_mom.*")
        report("t_mom/x", [1.0, 2.0, 3.0])
        report("t_mom/x", 4.0)
        c.update()
        assert c.num("t_mom/x") == 4
        assert c.mean("t_mom/x") == pytest.approx(2.5)
        assert c.std("t_mom/x") == pytest.approx(np.std([1, 2, 3, 4]))

    def test_nan_filtered(self):
        c = Collector(regex="t_nan.*")
        report("t_nan/x", [1.0, np.nan, np.inf, 3.0])
        c.update()
        assert c.num("t_nan/x") == 2
        assert c.mean("t_nan/x") == pytest.approx(2.0)

    def test_report0_single_process(self):
        c = Collector(regex="t_r0.*")
        report0("t_r0/x", 5.0)
        c.update()
        assert c.mean("t_r0/x") == pytest.approx(5.0)

    def test_jax_array_input(self):
        c = Collector(regex="t_jax.*")
        report("t_jax/x", jnp.arange(4.0))
        c.update()
        assert c.mean("t_jax/x") == pytest.approx(1.5)


class TestMisc:
    def test_assert_shape(self):
        assert_shape(jnp.zeros((2, 3, 4)), (2, None, 4))
        with pytest.raises(AssertionError):
            assert_shape(jnp.zeros((2, 3)), (2, 4))

    def test_tile_images(self):
        imgs = np.arange(5 * 2 * 3 * 1).reshape(5, 2, 3, 1).astype(np.float32)
        tiled = tile_images(imgs, grid_w=3)
        assert tiled.shape == (2 * 2, 3 * 3, 1)
        np.testing.assert_array_equal(tiled[:2, :3, 0], imgs[0, :, :, 0])

    def test_find_nonfinite(self):
        tree = {"a": jnp.ones(3), "b": {"c": jnp.array([1.0, np.nan])}}
        bad = find_nonfinite(tree)
        assert len(bad) == 1 and "'c'" in bad[0]

    def test_compare_caches(self):
        a = {"x": jnp.ones(3), "sub": {"y": jnp.zeros(2)}}
        b = {"x": jnp.ones(3), "sub": {"y": jnp.zeros(2) + 1e-2}}
        assert compare_caches(a, a) == []
        diffs = compare_caches(a, b)
        assert len(diffs) == 1 and "/sub/y" in diffs[0]


class TestTrainStateCheckpoint:
    def test_save_restore_round_trip(self, tiny, tmp_path):
        """Orbax train-state checkpoint round trip, including the schema-free
        extra blob (a growing loss list must not break resume)."""
        from autoregressive_diffusion_tpu.train import (create_train_state,
                                                        make_optimizer)
        from autoregressive_diffusion_tpu.utils import (latest_step,
                                                        restore_train_state,
                                                        save_train_state)

        cfg, model, variables = tiny
        tx = make_optimizer(learning_rate=1e-3)
        state = create_train_state(model, variables, tx)
        save_train_state(str(tmp_path), 7, jax.device_get(state),
                         {"losses": [1.0, 2.0, 3.0], "ref_lr": 1e-2})
        assert latest_step(str(tmp_path)) == 7

        restored, extra = restore_train_state(str(tmp_path), 7, state)
        assert list(extra["losses"]) == [1.0, 2.0, 3.0]
        assert float(extra["ref_lr"]) == pytest.approx(1e-2)
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # restored leaves are host numpy (tunneled-TPU deadlock guard)
        assert all(isinstance(l, np.ndarray) or np.isscalar(l)
                   for l in jax.tree.leaves(restored.params))

    def test_async_save_restore_round_trip(self, tiny, tmp_path):
        """block=False runs the disk write on a background thread (round-4
        sync saves stalled CS training ~120 s); restore/latest_step must
        join the in-flight write and see identical data. The foreground
        host snapshot means mutating the live state after save returns
        cannot corrupt the checkpoint (donation safety)."""
        from autoregressive_diffusion_tpu.train import (create_train_state,
                                                        make_optimizer)
        from autoregressive_diffusion_tpu.utils import (latest_step,
                                                        restore_train_state,
                                                        save_train_state,
                                                        wait_for_pending_saves)

        cfg, model, variables = tiny
        tx = make_optimizer(learning_rate=1e-3)
        state = create_train_state(model, variables, tx)
        expect = jax.device_get(state)
        save_train_state(str(tmp_path), 3, jax.device_get(state),
                         {"losses": [0.5]}, keep=2, block=False)
        assert latest_step(str(tmp_path)) == 3  # waits for the write
        restored, extra = restore_train_state(str(tmp_path), 3, state)
        assert list(extra["losses"]) == [0.5]
        for a, b in zip(jax.tree.leaves(expect.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        wait_for_pending_saves()  # idempotent when nothing is pending

    def test_save_rotation_keeps_newest(self, tiny, tmp_path):
        """keep=N prunes all but the newest N step dirs (a full TrainState is
        ~800 MB at gym scale; unbounded step dirs would eat the disk on a
        long run) and the survivors stay restorable."""
        from autoregressive_diffusion_tpu.train import (create_train_state,
                                                        make_optimizer)
        from autoregressive_diffusion_tpu.utils import (latest_step,
                                                        restore_train_state,
                                                        save_train_state)

        cfg, model, variables = tiny
        tx = make_optimizer(learning_rate=1e-3)
        state = create_train_state(model, variables, tx)
        host = jax.device_get(state)
        for s in (1, 5, 9, 12):
            save_train_state(str(tmp_path), s, host, {"losses": [float(s)]},
                             keep=2)
        names = sorted(p.name for p in tmp_path.iterdir()
                       if p.name.startswith("step_"))
        assert names == ["step_000000009", "step_000000012"]
        assert latest_step(str(tmp_path)) == 12
        _, extra = restore_train_state(str(tmp_path), 12, state)
        assert list(extra["losses"]) == [12.0]

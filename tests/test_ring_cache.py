"""Ring-buffer (sliding window) KV cache: rollouts past `max_frames` stay
correct instead of silently corrupting the cache.

The reference's KV cache grows forever (torch.cat per frame,
/root/reference/edm2/attention/attention_modules.py:51-57) so rollouts are
memory-unbounded; the TPU cache is a fixed ring of `max_frames` slots and
attention sees the last `max_frames` frames at ANY rollout length
(models/attention.py ring_slot_positions/ring_write).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoregressive_diffusion_tpu.models.attention import (
    VideoAttention, ring_slot_positions, ring_write)


def test_ring_slot_positions():
    # capacity 4, after 6 frames written: slot i holds largest p<6, p%4==i
    pos = np.asarray(ring_slot_positions(6, 4))
    np.testing.assert_array_equal(pos, [4, 5, 2, 3])
    # fewer frames than capacity: unwritten slots are negative
    pos = np.asarray(ring_slot_positions(2, 4))
    np.testing.assert_array_equal(pos, [0, 1, -2, -1])
    # exactly full
    pos = np.asarray(ring_slot_positions(4, 4))
    np.testing.assert_array_equal(pos, [0, 1, 2, 3])
    # empty
    assert (np.asarray(ring_slot_positions(0, 4)) < 0).all()


def test_ring_write_overwrites_oldest():
    buf = jnp.zeros((1, 1, 4, 2, 3))

    def frame(p):
        return jnp.full((1, 1, 1, 2, 3), float(p))

    for p in range(7):
        buf = ring_write(buf, frame(p), p)
    # after 7 writes: slots hold frames [4, 5, 6, 3]
    np.testing.assert_array_equal(
        np.asarray(buf[0, 0, :, 0, 0]), [4.0, 5.0, 6.0, 3.0])

    # multi-frame write wrapping the ring
    buf2 = jnp.zeros((1, 1, 4, 2, 3))
    new = jnp.concatenate([frame(p) for p in range(3, 9)], axis=2)  # 6 > 4
    buf2 = ring_write(buf2, new, 3)
    np.testing.assert_array_equal(
        np.asarray(buf2[0, 0, :, 0, 0]), [8.0, 5.0, 6.0, 7.0])


@pytest.fixture(scope="module")
def attn_setup():
    mod = VideoAttention(channels=8, num_heads=2, max_frames=4)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 1, 2, 2, 8))
    v = mod.init(key, x0, None, False, 0, "eval", False)
    frames_all = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 2, 2, 8))
    return mod, v, frames_all


def _decode_rollout(mod, v, frames_all, n):
    """Feed n frames one at a time through the ring cache; return outputs."""
    cache, outs = None, []
    for i in range(n):
        y, cache = mod.apply(v, frames_all[:, i:i + 1], cache, True, i,
                             "eval", False)
        outs.append(y)
    return outs


def test_decode_past_capacity_matches_windowed_oracle(attn_setup):
    """The core guarantee: decode at frame i (ANY i, including far past
    capacity) equals a fresh eval over exactly the last (max_frames + 1)
    frames -- RoPE is relative, so absolute ring positions and 0-based
    window positions give identical attention."""
    mod, v, frames_all = attn_setup
    w = mod.max_frames
    outs = _decode_rollout(mod, v, frames_all, 12)
    for i in range(12):
        lo = max(0, i - w)
        window = frames_all[:, lo:i + 1]
        oracle, _ = mod.apply(v, window, None, False, 0, "eval", False)
        got = np.asarray(outs[i][:, 0])
        want = np.asarray(oracle[:, -1])
        np.testing.assert_allclose(got, want, rtol=0, atol=3e-5,
                                   err_msg=f"frame {i}")


def test_warm_prefill_wrapping_matches_oracle(attn_setup):
    """Multi-frame prefill into a warm cache that wraps the ring: the last
    new frame still attends exactly its window."""
    mod, v, frames_all = attn_setup
    # 3 frames cached, then prefill 3 more (3+3 > capacity 4 -> wrap)
    cache = None
    for i in range(3):
        _, cache = mod.apply(v, frames_all[:, i:i + 1], cache, True, i,
                             "eval", False)
    y, cache2 = mod.apply(v, frames_all[:, 3:6], cache, True, 3, "eval",
                          False)
    # query at pos 5: window = positions 2..5 (capacity-4 ring: 2,3,4 + self)
    oracle, _ = mod.apply(v, frames_all[:, 2:6], None, False, 0, "eval",
                          False)
    np.testing.assert_allclose(np.asarray(y[:, -1]),
                               np.asarray(oracle[:, -1]), atol=3e-5)
    # cache after the wrap holds positions [4, 5, 2, 3]
    k = cache2["k"]
    assert k.shape[2] == 4
    # decoding the next frame (pos 6) still matches its window
    y6, _ = mod.apply(v, frames_all[:, 6:7], cache2, True, 6, "eval", False)
    oracle6, _ = mod.apply(v, frames_all[:, 2:7], None, False, 0, "eval",
                           False)
    np.testing.assert_allclose(np.asarray(y6[:, 0]),
                               np.asarray(oracle6[:, -1]), atol=3e-5)


def test_xpos_tables_bounded_at_huge_frame_counts(attn_setup):
    """The xPos pivot tracks the frame counter, so decode at frame 100000
    is finite (a fixed pivot would overflow fp32 past ~2.4k frames)."""
    mod, v, frames_all = attn_setup
    # build a valid 4-frame cache as if at frame 100000
    cache = None
    big = 100_000
    for j in range(4):
        _, cache = mod.apply(v, frames_all[:, j:j + 1], cache, True,
                             big - 4 + j, "eval", False)
    y, _ = mod.apply(v, frames_all[:, 5:6], cache, False, big, "eval", False)
    assert np.isfinite(np.asarray(y)).all()
    # and it still equals the windowed oracle (relative positions)
    oracle, _ = mod.apply(v, frames_all[:, :5], None, False, 0, "eval", False)
    got = np.asarray(y[:, 0])
    want_in = jnp.concatenate([frames_all[:, :4], frames_all[:, 5:6]], axis=1)
    oracle2, _ = mod.apply(v, want_in, None, False, 0, "eval", False)
    np.testing.assert_allclose(got, np.asarray(oracle2[:, -1]), atol=3e-4)


def test_full_model_rollout_past_capacity():
    """End-to-end: Precond sampler rollout runs past max_frames with finite
    outputs and an advancing counter (the round-3 cliff: frame max_frames+1
    overwrote the last slot while RoPE desynchronized)."""
    from functools import partial

    from autoregressive_diffusion_tpu.models import Precond, UNetConfig
    from autoregressive_diffusion_tpu.models.cache import init_cache
    from autoregressive_diffusion_tpu.sampling.sampler import edm_sampler

    cfg = UNetConfig(img_resolution=8, img_channels=4, model_channels=8,
                     channel_mult=(1, 2), num_blocks=1,
                     video_attn_resolutions=(4,), frame_attn_resolutions=(8,),
                     max_frames=4)
    model = Precond(cfg, sigma_data=0.5)
    b = 1
    x = jax.random.normal(jax.random.PRNGKey(0), (b, 2, 8, 8, 4))
    sig = jnp.full((b, 2), 0.05)
    v = model.init(jax.random.PRNGKey(1), x, sig, None, mode="eval")
    cache = init_cache(model, v, batch_size=b)
    _, cache = model.apply(v, x, sig, None, cache=cache, update_cache=True,
                           mode="eval")
    sampler = jax.jit(partial(edm_sampler, model, num_steps=4),
                      static_argnames=("shape",))
    key = jax.random.PRNGKey(2)
    for i in range(7):  # rolls through 2 + 7 = 9 frames >> capacity 4
        key, k = jax.random.split(key)
        xf, _, _, cache = sampler(v, cache, k, shape=(b, 1, 8, 8, 4))
        assert np.isfinite(np.asarray(xf)).all(), f"NaN at rollout frame {i}"
    assert int(cache["frames"]) == 9

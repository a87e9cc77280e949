"""Train state + jitted DART train step.

Replaces the reference's imperative loop body (gym_train.py:88-112 /
cs_train.py:96-121): one pure function performs loss, grads, clip, AdamW,
forced weight renorm, power-function EMA update, and (optionally) gradient
accumulation by lax.scan over microbatches -- no no_sync() needed, the mean
over the global (sharded) batch already produces globally-averaged grads
under SPMD.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .ema import ema_update, init_ema, std_to_exp
from .loss import EDM2LossConfig, edm2_loss
from .loss_weight import init_coefs
from .optim import forced_weight_norm, make_optimizer


class TrainState(struct.PyTreeNode):
    step: jax.Array                     # optimizer steps taken
    params: Any
    buffers: Any                        # MPFourier freqs/phases etc.
    opt_state: Any
    ema: Tuple[Any, ...]                # one param tree per EMA std
    coefs: jax.Array                    # MultiNoiseLoss Fourier coefficients
    ema_stds: Tuple[float, ...] = struct.field(pytree_node=False,
                                               default=(0.050, 0.100))


def create_train_state(model, variables, tx, ema_stds=(0.050, 0.100)):
    params = variables["params"]
    return TrainState(
        step=jnp.int32(0),
        params=params,
        buffers=variables.get("buffers", {}),
        opt_state=tx.init(params),
        ema=init_ema(params, ema_stds),
        coefs=init_coefs(),
        ema_stds=tuple(ema_stds),
    )


def make_train_step(model, loss_cfg: EDM2LossConfig, tx,
                    batch_size: int, microbatch: Optional[int] = None):
    """Returns train_step(state, images, conditioning, key, just_2d) ->
    (state, metrics). `just_2d` is static (two compiled variants, matching
    the reference's `just_2d = i%4==0` cadence, gym_train.py:96).

    If `microbatch` is given and smaller than the local batch, gradients are
    accumulated with lax.scan over microbatch slices (constant memory),
    replacing the reference's no_sync() accumulation (cs_train.py:108-109).
    """
    ema_gammas = None  # resolved lazily from state.ema_stds

    def loss_for(params, state, images, conditioning, key, just_2d,
                 sample_offset=0):
        variables = {"params": params, "buffers": state.buffers}
        return edm2_loss(model, variables, images, key, loss_cfg,
                         conditioning, state.coefs, just_2d,
                         sample_offset=sample_offset)

    def grads_of(state, images, conditioning, key, just_2d):
        b = images.shape[0]
        if microbatch is None or microbatch >= b:
            (loss, aux), grads = jax.value_and_grad(
                loss_for, has_aux=True)(state.params, state, images,
                                        conditioning, key, just_2d)
            return loss, aux, grads

        assert b % microbatch == 0
        n = b // microbatch
        imgs = images.reshape((n, microbatch) + images.shape[1:])
        conds = (conditioning.reshape((n, microbatch) + conditioning.shape[1:])
                 if conditioning is not None else None)
        # Per-sample RNG: slice j draws samples [j*m, (j+1)*m) from the SAME
        # folded-key stream the full batch would, so accumulation == full
        # batch exactly (guarded by
        # tests/test_training.py::test_train_step_microbatch_matches_full).
        offsets = jnp.arange(n) * microbatch

        def body(carry, inp):
            g_acc, l_acc, u_acc = carry
            if conds is not None:
                im, cd, off = inp
            else:
                im, off = inp
                cd = None
            (loss, aux), grads = jax.value_and_grad(
                loss_for, has_aux=True)(state.params, state, im, cd, key,
                                        just_2d, off)
            g_acc = jax.tree.map(lambda a, g: a + g / n, g_acc, grads)
            return (g_acc, l_acc + loss / n, u_acc + aux["unweighted"] / n), \
                (aux["sigma"], aux["losses"])

        g0 = jax.tree.map(jnp.zeros_like, state.params)
        (grads, loss, unweighted), (sigs, lss) = jax.lax.scan(
            body, (g0, jnp.float32(0), jnp.float32(0)),
            (imgs, conds, offsets) if conds is not None else (imgs, offsets))
        aux = dict(sigma=sigs.reshape(-1, sigs.shape[-1]),
                   losses=lss.reshape(-1, lss.shape[-1]),
                   unweighted=unweighted)
        return loss, aux, grads

    def train_step(state: TrainState, images, conditioning, key,
                   just_2d: bool = False):
        loss, aux, grads = grads_of(state, images, conditioning, key, just_2d)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = forced_weight_norm(params)

        # power-function EMA (reference gym_train.py:108, phema.py:104-108)
        step1 = state.step + 1
        cur_nimg = (step1).astype(jnp.float32) * batch_size
        new_ema = []
        for std, e in zip(state.ema_stds, state.ema):
            gamma = float(std_to_exp(std))
            beta = (1.0 - batch_size / cur_nimg) ** (gamma + 1.0)
            new_ema.append(ema_update(e, params, beta))

        new_state = state.replace(step=step1, params=params,
                                  opt_state=opt_state, ema=tuple(new_ema))
        metrics = dict(loss=loss, unweighted=aux["unweighted"],
                       sigma=aux["sigma"], losses=aux["losses"],
                       grad_norm=optax.global_norm(grads))
        return new_state, metrics

    return train_step


def make_scanned_train_step(model, loss_cfg: EDM2LossConfig, tx,
                            batch_size: int,
                            microbatch: Optional[int] = None):
    """Device-side training loop: lax.scan of `make_train_step` over a
    leading steps axis, so ONE dispatch executes G optimizer steps.

    On TPU the per-step host->device dispatch (especially over a tunneled
    chip) can rival the 5-10 ms step itself; scanning steps on device is the
    idiomatic fix -- there is no reference equivalent because torch eager
    re-dispatches every op anyway. Batches: images (G, b, t, h, w, c),
    conditioning (G, b, t). Metrics are stacked per step; `sigma`/`losses`
    are flattened over (G, b) for the loss-weight fit.
    """
    step = make_train_step(model, loss_cfg, tx, batch_size, microbatch)

    def scanned(state: TrainState, images, conditioning, key,
                just_2d: bool = False):
        g = images.shape[0]
        keys = jax.random.split(key, g)

        def body(s, inp):
            im, cd, k = inp
            s, m = step(s, im, cd, k, just_2d)
            return s, (m["loss"], m["unweighted"], m["grad_norm"],
                       m["sigma"], m["losses"])

        state, (loss, unw, gn, sig, lss) = jax.lax.scan(
            body, state, (images, conditioning, keys))
        metrics = dict(loss=loss.mean(), loss_per_step=loss,
                       unweighted=unw.mean(), grad_norm=gn[-1],
                       sigma=sig.reshape(-1, sig.shape[-1]),
                       losses=lss.reshape(-1, lss.shape[-1]))
        return state, metrics

    return scanned


def make_replay_train_step(model, loss_cfg: EDM2LossConfig, tx,
                           batch_size: int,
                           microbatch: Optional[int] = None):
    """Device-side training loop over a DEVICE-RESIDENT replay buffer:
    step(state, buf_images, buf_cond, idx, key, just_2d) runs idx.shape[0]
    optimizer steps per dispatch, each gathering its batch
    `buf_images[idx[j]]` on device.

    This is the data-path counterpart of `make_scanned_train_step`: with the
    replay buffer living in HBM (data/replay.py::DeviceReplay), steady-state
    training moves ZERO batch bytes over the host<->device link -- only the
    (G, b) int32 index matrix and one PRNG key cross per dispatch. On a
    one-core host with a tunneled chip the per-step batch upload
    (b*t*h*w*c floats) plus the host-side gather copy dominate the step
    (measured: 6 samples/s real vs 58 compute-bound); on-device gather
    removes both. The reference has no equivalent: torch DataLoader workers
    feed fresh batches from host RAM every step (gym_train.py:61-62).
    """
    step = make_train_step(model, loss_cfg, tx, batch_size, microbatch)

    def replay_step(state: TrainState, buf_images, buf_cond, idx, key,
                    just_2d: bool = False):
        keys = jax.random.split(key, idx.shape[0])

        def body(s, inp):
            ix, k = inp
            im = jnp.take(buf_images, ix, axis=0)
            cd = jnp.take(buf_cond, ix, axis=0)
            s, m = step(s, im, cd, k, just_2d)
            return s, (m["loss"], m["unweighted"], m["grad_norm"],
                       m["sigma"], m["losses"])

        state, (loss, unw, gn, sig, lss) = jax.lax.scan(
            body, state, (idx, keys))
        metrics = dict(loss=loss.mean(), loss_per_step=loss,
                       unweighted=unw, grad_norm=gn[-1],
                       sigma=sig.reshape(-1, sig.shape[-1]),
                       losses=lss.reshape(-1, lss.shape[-1]))
        return state, metrics

    return replay_step

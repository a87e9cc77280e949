"""SPMD parallelism over TPU meshes.

The reference scales with DDP-over-NCCL only (/root/reference/cs_train.py:
53-54, 164-174; SURVEY.md section 2.7). The TPU-native equivalent is a
('data', 'model') jax.sharding.Mesh:

  * data parallelism  -> batch axis sharded over 'data' (the mean loss over
    the global batch makes XLA emit the gradient all-reduce over ICI; no
    no_sync/allreduce plumbing),
  * tensor parallelism -> magnitude-preserving conv/dense kernels sharded on
    their OUTPUT channel axis over 'model'; attention heads follow the
    channel sharding, so the DART attention is head-sharded (a form of
    sequence-parallel work splitting across the 2T-frame concat),
  * rank-conditional work (loss-fit history, checkpoints, dashboards) ->
    jax.process_index() == 0.

Multi-slice scaling (DCN) uses the same API with a larger mesh; collectives
ride ICI within a slice by construction because 'model' is the minor mesh
axis.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(tp: int = 1, devices=None, num_slices: Optional[int] = None,
                sp: int = 1) -> Mesh:
    """('replica', 'data', 'seq', 'model') mesh: `tp`-way tensor parallelism,
    `sp`-way sequence (time-axis) parallelism.

    'model' is the minor (fastest / ICI-nearest) axis, 'seq' the next --
    both exchange activations every layer, so they must stay on ICI.
    'replica' is the outermost axis and spans TPU slices, so only pure
    data-parallel gradient all-reduces cross the slower DCN links. Slice
    count is taken from the devices' `slice_index` when present (real
    multi-slice topologies) or from `num_slices` (virtual-device tests);
    defaults (sp=1) behave exactly like the previous ('data','model') mesh.

    Sequence parallelism shards the frame axis of activations
    (`seq_sharding`): per-frame compute (convs, per-frame attention, loss)
    stays local; the video-attention K/V exchange becomes XLA-inserted ICI
    collectives. Use when clip length, not batch, is the memory constraint
    (CS-scale T=64+ clips). Beyond-reference capability: the reference is
    DDP-only (cs_train.py:53-54).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % (sp * tp) == 0, f"{n} devices not divisible by sp*tp={sp*tp}"
    if num_slices is None:
        slice_ids = sorted({getattr(d, "slice_index", 0) for d in devices})
        num_slices = len(slice_ids)
        if num_slices > 1:
            # group devices by slice so 'replica' really is the DCN axis
            by_slice = {s: [] for s in slice_ids}
            for d in devices:
                by_slice[getattr(d, "slice_index", 0)].append(d)
            sizes = {len(v) for v in by_slice.values()}
            assert len(sizes) == 1, f"uneven slices: {by_slice}"
            devices = [d for s in slice_ids for d in by_slice[s]]
    assert n % (num_slices * sp * tp) == 0, (n, num_slices, sp, tp)
    arr = np.asarray(devices).reshape(
        num_slices, n // (num_slices * sp * tp), sp, tp)
    return Mesh(arr, ("replica", "data", "seq", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    if "replica" in mesh.shape:
        return NamedSharding(mesh, P(("replica", "data")))
    return NamedSharding(mesh, P("data"))


def seq_sharding(mesh: Mesh) -> NamedSharding:
    """[b, t, ...] activation sharding: batch over ('replica','data'), the
    frame axis over 'seq'. With sp=1 this degenerates to batch_sharding."""
    if "replica" in mesh.shape:
        return NamedSharding(mesh, P(("replica", "data"), "seq"))
    return NamedSharding(mesh, P("data", "seq"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params, min_shard_size: int = 128,
                   fsdp: bool = False, fsdp_min_size: int = 2 ** 16):
    """NamedSharding tree for a parameter pytree: shard the output-channel
    (last) axis of every >=2D 'w'/'kernel' weight over 'model' when it
    divides evenly and is large enough; replicate everything else.

    fsdp=True additionally shards each large weight over the 'data' axis
    (ZeRO / fully-sharded data parallelism, the scaling-book "FSDP = params
    sharded over the batch axis" recipe): the largest remaining axis that
    divides the dp size carries 'data'; XLA then all-gathers the weight over
    ICI just-in-time for its matmul and reduce-scatters its gradient, and the
    optimizer state (which follows the param sharding, shard_train_state)
    stays sharded -- per-chip param+opt memory drops ~dp-fold. Only weights
    with >= fsdp_min_size elements participate: tiny tensors cost more in
    collective latency than they save in HBM. The 'replica' (DCN) axis never
    carries FSDP -- per-layer all-gathers must ride ICI, not DCN. The
    reference has no equivalent (DDP replicates everything,
    cs_train.py:53-54)."""
    tp = mesh.shape["model"]
    dp = mesh.shape["data"]

    def rule(path, p):
        name = None
        for e in reversed(path):
            if isinstance(e, jax.tree_util.DictKey):
                name = e.key
                break
        spec = [None] * p.ndim
        if (tp > 1 and name in ("w", "kernel") and p.ndim >= 2
                and p.shape[-1] % tp == 0 and p.shape[-1] >= min_shard_size):
            spec[-1] = "model"
        if (fsdp and dp > 1 and name in ("w", "kernel") and p.ndim >= 2
                and p.size >= fsdp_min_size):
            free = [ax for ax in range(p.ndim)
                    if spec[ax] is None and p.shape[ax] % dp == 0]
            if free:
                spec[max(free, key=lambda ax: p.shape[ax])] = "data"
        if all(s is None for s in spec):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_train_state(state, mesh: Mesh, min_shard_size: int = 128,
                      fsdp: bool = False, fsdp_min_size: int = 2 ** 16):
    """Place a TrainState on the mesh: params/EMA/opt-state sharded by the
    param rule, scalars/coefs replicated. fsdp=True turns data parallelism
    into fully-sharded data parallelism (see param_sharding)."""
    p_shard = param_sharding(mesh, state.params, min_shard_size,
                             fsdp=fsdp, fsdp_min_size=fsdp_min_size)
    rep = replicated(mesh)

    state_shardings = state.replace(
        step=rep,
        params=p_shard,
        buffers=jax.tree.map(lambda _: rep, state.buffers),
        opt_state=_match_params(state.opt_state, state.params, p_shard, rep),
        ema=tuple(p_shard for _ in state.ema),
        coefs=rep,
    )
    return jax.device_put(state, state_shardings), state_shardings


def gather_to_host(tree):
    """Host (numpy) copy of a pytree whose leaves may be sharded across
    processes (FSDP): non-fully-addressable leaves are first replicated via
    a jitted identity with replicated out_shardings (XLA all-gathers over
    ICI), then fetched. Leaves every fully-addressable leaf on the fast
    plain device_get path. Use this instead of jax.device_get before
    checkpointing a state that may carry FSDP shards.

    D2H copies are overlapped: every leaf's transfer is enqueued with
    copy_to_host_async() before any is materialized, so total wall time is
    ~one full-state transfer instead of a serial per-leaf sum (the round-4
    checkpoint stall's first component, logs/cs_synth_r4.log step 2020)."""
    def rep(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            x = jax.jit(lambda a: a, out_shardings=NamedSharding(
                x.sharding.mesh, P()))(x)
        return x
    tree = jax.tree.map(rep, tree)
    for leaf in jax.tree.leaves(tree):
        if isinstance(leaf, jax.Array):
            try:
                leaf.copy_to_host_async()
            except Exception:  # backends without async host copies
                pass
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def check_replica_consistency(params, rtol: float = 0.0) -> list:
    """Verify that every process holds identical parameter values --
    the SPMD analogue of the reference's check_ddp_consistency broadcast
    compare (torch_utils/misc.py:183-194). Returns a list of mismatch
    descriptions (empty == consistent). Cheap: compares per-leaf fp64 sums
    gathered across processes, not full tensors. FSDP-sharded leaves are
    summed under jit with replicated out_shardings (XLA all-gathers the
    shards) so the check works on non-fully-addressable arrays too."""
    def host_sum(p):
        if isinstance(p, jax.Array) and not p.is_fully_addressable:
            p = jax.jit(lambda a: a.astype(jnp.float32).sum(),
                        out_shardings=NamedSharding(p.sharding.mesh, P()))(p)
        return np.asarray(jax.device_get(p), np.float64).sum()

    sums = np.asarray([host_sum(p) for p in jax.tree.leaves(params)],
                      np.float64)
    if jax.process_count() == 1:
        return []
    from jax.experimental import multihost_utils
    all_sums = np.atleast_2d(np.asarray(
        multihost_utils.process_allgather(sums)))
    paths = [jax.tree_util.keystr(kp) for kp, _ in
             jax.tree_util.tree_flatten_with_path(params)[0]]
    bad = []
    for i, path in enumerate(paths):
        col = all_sums[:, i]
        ref = col[0]
        tol = rtol * max(abs(ref), 1e-30)
        if np.any(np.abs(col - ref) > tol):
            bad.append(f"{path}: per-process sums {col.tolist()}")
    return bad


def _match_params(opt_state, params, p_shard, rep):
    """Shard optimizer-state leaves that mirror the param tree (Adam m/v)
    like the params; everything else replicated."""
    flat_params, treedef = jax.tree_util.tree_flatten(params)

    def rule(leaf):
        return rep

    # optax states contain whole param-shaped subtrees; detect by structure
    def map_state(s):
        try:
            if jax.tree_util.tree_structure(s) == treedef:
                return p_shard
        except Exception:
            pass
        return None

    def recurse(s):
        m = map_state(s)
        if m is not None:
            return m
        if isinstance(s, tuple) and not hasattr(s, "_fields"):
            return tuple(recurse(x) for x in s)
        if hasattr(s, "_fields"):  # NamedTuple (optax states)
            return type(s)(*(recurse(getattr(s, f)) for f in s._fields))
        return jax.tree.map(rule, s)

    return recurse(opt_state)

"""autoregressive_diffusion_tpu: TPU-native autoregressive video diffusion.

A from-scratch JAX/Flax/Pallas framework with the capabilities of the Oniris
reference (Francesco215/autoregressive_diffusion): DART sample-efficient
training, O(1)-per-frame autoregressive inference with fixed-shape KV/conv
caches, EDM2 magnitude-preserving UNet, group-causal video VAE, EDM sampler,
power-function EMA, and SPMD data/tensor parallelism over TPU meshes.
"""
__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: the Pallas kernels add many per-shape
# Mosaic compiles (~minutes cold on the remote AOT service); cached
# executables make every process after the first start in seconds.
# Opt out with AD_TPU_COMPILE_CACHE=0 or point it at another directory.
# Default-off on the CPU backend: XLA:CPU AOT results are host-ISA
# specific, and a cache dir shared between machines (e.g. a common home
# mount) can SIGILL a process that loads an executable compiled on a
# different CPU. Set AD_TPU_COMPILE_CACHE explicitly to cache on CPU.
_cache = _os.environ.get("AD_TPU_COMPILE_CACHE")
if _cache is None and _os.environ.get("JAX_PLATFORMS", "").strip() != "cpu":
    _cache = _os.path.expanduser("~/.cache/ad_tpu_xla")
if _cache not in (None, "0", ""):
    try:
        import jax as _jax
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

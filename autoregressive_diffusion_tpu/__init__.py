"""autoregressive_diffusion_tpu: TPU-native autoregressive video diffusion.

A from-scratch JAX/Flax/Pallas framework with the capabilities of the Oniris
reference (Francesco215/autoregressive_diffusion): DART sample-efficient
training, O(1)-per-frame autoregressive inference with fixed-shape KV/conv
caches, EDM2 magnitude-preserving UNet, group-causal video VAE, EDM sampler,
power-function EMA, and SPMD data/tensor parallelism over TPU meshes.
"""
__version__ = "0.1.0"

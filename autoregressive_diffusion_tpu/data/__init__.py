from .gym_data import GymDataGenerator, SyntheticVideoGenerator, batched
from .cs_data import (LocalLatentShards, batched_latents, write_latent_shard)

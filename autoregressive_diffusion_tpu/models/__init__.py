from .layers import MPConv, MPCausalConv3d, Gating, mp_sum_gated
from .attention import VideoAttention, FrameAttention
from .unet import UNet, UNetConfig, Precond, Block, MPFourier
from .cache import init_cache

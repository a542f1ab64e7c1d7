from .layers import (
    AttentionBlock,
    Downsample,
    GroupNorm32,
    ResBlock,
    Upsample,
    timestep_embedding,
)
from .unet import InpaintingUNet, UNet, UNetConfig, ffhq256_config

"""face-inpainting-diffusion-models_tpu — TPU-native face-inpainting diffusion.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
PyTorch reference `Sayzal28/Face-Inpainting-Diffusion-Models`: mask-aware
9-channel UNet, DDPM/DDIM sampling with known-region noise injection,
fine-tuning from FFHQ checkpoints, evaluation metrics, LoRA, and int8
quantization — redesigned for TPU (NHWC, bf16 MXU compute, scan-based
on-device samplers, mesh-sharded training).
"""

__version__ = "0.1.0"

from . import (
    data,
    diffusion,
    distill,
    lora,
    metrics,
    models,
    ops,
    parallel,
    quant,
    sampling,
    serving,
    training,
)
from .pipeline import (
    SAMPLER_PRESETS,
    InpaintingPipeline,
    PipelineConfig,
    create_model_and_schedule,
)

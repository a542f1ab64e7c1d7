from .sampler import (
    SamplerConfig,
    inpaint_sample,
    repaint_level_sequence,
    sample,
)

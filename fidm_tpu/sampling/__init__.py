from .cfg import classifier_free, drop_labels
from .sampler import (
    SamplerConfig,
    inpaint_sample,
    repaint_level_sequence,
    sample,
)

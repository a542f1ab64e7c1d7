from .cfg import classifier_free, drop_labels
from .sampler import (
    SamplerConfig,
    inpaint_sample,
    nonuniform_keysteps,
    repaint_level_sequence,
    sample,
)

from .sampler import SamplerConfig, inpaint_sample, sample

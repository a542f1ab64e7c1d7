from .progressive import distill_boundaries, make_distill_step

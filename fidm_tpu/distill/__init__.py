from .consistency import (
    consistency_grid,
    consistency_sample,
    consistency_x0,
    make_consistency_step,
)
from .progressive import distill_boundaries, make_distill_step

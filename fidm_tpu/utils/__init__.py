from .cache import enable_compilation_cache
from .image import save_comparison_grid, save_png, to_uint8
from .profiler import StepTimer, trace

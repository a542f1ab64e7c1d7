from .calibrate import (
    collect_input_moments,
    quantize_params_calibrated,
    quantize_tensor_calibrated,
)
from .int8 import (
    dequantize_params,
    dequantize_tensor,
    quantize_params,
    quantize_tensor,
    quantized_size_bytes,
)

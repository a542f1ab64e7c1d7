from .int8 import (
    dequantize_params,
    dequantize_tensor,
    quantize_params,
    quantize_tensor,
    quantized_size_bytes,
)

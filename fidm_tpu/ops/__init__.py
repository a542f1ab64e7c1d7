from .attention import qkv_attention
from .registry import set_use_pallas, use_pallas

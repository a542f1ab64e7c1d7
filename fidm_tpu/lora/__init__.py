from .lora import (
    DEFAULT_TARGETS,
    init_lora,
    lora_param_count,
    merge_lora,
    select_lora_targets,
)

from topomap_tpu.lora.lora import (
    LoRASpec,
    build_lora_tree,
    merge_lora,
    count_lora_params,
    lora_param_paths,
    attach_condition,
)

__all__ = [
    "LoRASpec",
    "build_lora_tree",
    "merge_lora",
    "count_lora_params",
    "lora_param_paths",
    "attach_condition",
]

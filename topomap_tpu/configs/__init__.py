from topomap_tpu.configs.presets import PRESETS, ExperimentPreset, get_preset

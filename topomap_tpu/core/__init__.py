from topomap_tpu.core.schedules import (
    DiffusionSchedule,
    make_schedule,
    q_sample,
    predict_start_from_noise,
    make_ddim_timesteps,
)
from topomap_tpu.core.ddim import DDIMConfig, ddim_sample, guess_mode_control_scales
from topomap_tpu.core.consistency import (
    boundary_scalings,
    consistency_fn,
    consistency_sample,
    make_consistency_timesteps,
)

__all__ = [
    "boundary_scalings",
    "consistency_fn",
    "consistency_sample",
    "make_consistency_timesteps",
    "DiffusionSchedule",
    "make_schedule",
    "q_sample",
    "predict_start_from_noise",
    "make_ddim_timesteps",
    "DDIMConfig",
    "ddim_sample",
    "guess_mode_control_scales",
]

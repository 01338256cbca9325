from topomap_tpu.train.losses import (
    eps_mse,
    masked_color_losses,
    maskloss_total,
    parse_prompt_class,
    prompt_class_rgb,
    ssim_3x3,
    lpips_init,
    lpips_distance,
    perceptual_mix_loss,
)
from topomap_tpu.train.optim import (
    OptimConfig,
    LABELERS,
    GROUP_LRS,
    ParamPartition,
    build_optimizer,
    label_params,
    trainable_mask,
    count_trainable,
    warmup_cosine_floor,
)
from topomap_tpu.train.distill import (
    DistillConfig,
    DistillState,
    init_distill_state,
    make_distill_step,
    make_guidance_distill_step,
    make_consistency_distill_step,
    prepare_student,
    teacher_view,
)
from topomap_tpu.train.trainer import (
    TrainState,
    MeterEMA,
    init_train_state,
    make_train_step,
    make_train_scan,
    make_validate_step,
    stack_batches,
)

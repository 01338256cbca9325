from topomap_tpu.eval.metrics import (
    mse_rgb,
    psnr_rgb,
    color_histogram_l1,
    mean_iou,
    siegfried_mask_mse,
    best_of_n_vote,
    l1_01,
)
from topomap_tpu.eval.losslog import (
    new_loss_log,
    load_loss_log,
    save_loss_log,
    save_loss_curve,
    append_train,
    append_val,
)
from topomap_tpu.eval.sampling import (
    sample_preview,
    sample_preview_cnlora,
    preview_three_modes,
    stylize_sheet,
    pooled_seg_feature,
)

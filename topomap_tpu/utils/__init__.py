from topomap_tpu.utils.checkpoint import (
    save_train_state,
    restore_latest,
    save_filtered,
    load_filtered,
)
from topomap_tpu.utils.inspect_tools import audit_checkpoint, summarize_params, assert_frozen, count_params
from topomap_tpu.utils.observability import StepTimer, ThroughputLog, profile_trace, check_finite

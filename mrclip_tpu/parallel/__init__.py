from .mesh import (
    batch_spec,
    create_mesh,
    init_distributed,
    local_batch_to_global,
    param_sharding_rules,
    replicate,
    shard_params,
)
from .train_step import (
    LOGIT_SCALE_MAX,
    TrainState,
    build_eval_step,
    build_train_step,
    create_optimizer,
    create_train_state,
    make_loss_apply,
    register_loss_adapter,
)

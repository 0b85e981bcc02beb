from .loop import AverageMeter, evaluate, get_features, linear_probe, test_metrics, train_one_epoch
from .metrics import get_clip_metrics, rank_metrics, volume_voting_metrics
from .params import parse_args
from .scheduler import const_lr, const_lr_cooldown, cosine_lr, create_scheduler
from .zero_shot import build_zero_shot_classifier, zero_shot_accuracy, zero_shot_eval
from .profiler import profile_model
from .vision_only import (
    build_vision_only_step,
    evaluate_vision_only,
    train_one_epoch_vision_only,
)

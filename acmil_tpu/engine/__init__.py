from acmil_tpu.engine.train import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    train_one_epoch,
    evaluate,
    is_better,
    register_loss_adapter,
    LOSS_ADAPTERS,
)
from acmil_tpu.engine.metrics import classification_metrics, auroc, f1_macro, accuracy

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "train_one_epoch",
    "evaluate",
    "is_better",
    "register_loss_adapter",
    "LOSS_ADAPTERS",
    "classification_metrics",
    "auroc",
    "f1_macro",
    "accuracy",
]

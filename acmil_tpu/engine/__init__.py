from acmil_tpu.engine.train import (
    TrainState,
    create_train_state,
    make_train_step,
    make_scan_train_step,
    family_supports_scan,
    make_eval_step,
    make_scan_eval_step,
    train_one_epoch,
    train_one_epoch_scanned,
    evaluate,
    evaluate_scanned,
    is_better,
)
from acmil_tpu.engine.families import FAMILIES, Family, get_family, register_family
from acmil_tpu.engine.metrics import classification_metrics, auroc, f1_macro, accuracy

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_scan_train_step",
    "family_supports_scan",
    "make_eval_step",
    "make_scan_eval_step",
    "train_one_epoch",
    "train_one_epoch_scanned",
    "evaluate",
    "evaluate_scanned",
    "is_better",
    "FAMILIES",
    "Family",
    "get_family",
    "register_family",
    "classification_metrics",
    "auroc",
    "f1_macro",
    "accuracy",
]

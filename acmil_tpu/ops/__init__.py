from acmil_tpu.ops.masked import (
    NEG_INF,
    masked_softmax,
    masked_fill,
    masked_topk_mask,
    stkim_mask,
    masked_mean,
    masked_max,
    softmax_one,
)

__all__ = [
    "NEG_INF",
    "masked_softmax",
    "masked_fill",
    "masked_topk_mask",
    "stkim_mask",
    "masked_mean",
    "masked_max",
    "softmax_one",
]

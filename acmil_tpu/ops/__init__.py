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
from acmil_tpu.ops.attn_pool import (
    fused_gated_attn_pool,
    fused_gated_attn_pool_batched,
)
from acmil_tpu.ops.nystrom import nystrom_attention, newton_schulz_pinv
from acmil_tpu.ops.kmeans import kmeans, pca_whiten, build_confounder_prototypes
from acmil_tpu.ops.topk_svm import (smooth_top1_svm_loss,
                                    smooth_topk_svm_loss,
                                    topk_hard_svm_loss)
from acmil_tpu.ops.sam import sam_gradient

__all__ = [
    "NEG_INF",
    "masked_softmax",
    "masked_fill",
    "masked_topk_mask",
    "stkim_mask",
    "masked_mean",
    "masked_max",
    "softmax_one",
    "fused_gated_attn_pool",
    "fused_gated_attn_pool_batched",
    "nystrom_attention",
    "newton_schulz_pinv",
    "kmeans",
    "pca_whiten",
    "build_confounder_prototypes",
    "smooth_top1_svm_loss",
    "smooth_topk_svm_loss",
    "topk_hard_svm_loss",
    "sam_gradient",
]

"""IBMIL — interventional bag MIL with a confounder dictionary.

Reference: `architecture/ibmil.py:38-110` and the two-phase protocol in
`Step3_WSI_classification_IBMIL.py` (phase 1: plain attention MIL; phase 2:
reload with `c_path` confounder prototypes and re-train).

Phase-2 mechanics: the pooled bag feature queries the k-means prototype
dictionary through a joint space (`W_q`/`W_k`, ibmil.py:60-62), the
softmax-over-prototypes attention pools a confounder feature, merged into
the bag feature by cat/add/sub (`ibmil.py:90-107`).

The prototype dictionary comes from :mod:`acmil_tpu.ops.kmeans` (on-device
PCA + Lloyd iterations replacing faiss GPU k-means, `IBMIL_clustering.py:60`).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from acmil_tpu.models.common import Dense as TDense
import jax
import jax.numpy as jnp
import numpy as np

from acmil_tpu.models import register_model
from acmil_tpu.models.common import AttentionGated, Classifier1fc, DimReduction
from acmil_tpu.ops.masked import masked_softmax


class IBMIL(nn.Module):
    n_class: int
    d_inner: int = 128
    d_attn: int = 128
    confounder_dim: int = 128        # joint query/key space
    confounder_merge: str = "cat"    # cat | add | sub
    n_confounder: int = 0            # 0 = phase 1 (no deconfounding)
    confounder_learn: bool = False
    confounder_init: Optional[tuple] = None  # tuple-of-tuples (hashable) prototype matrix
    droprate: float = 0.0

    @nn.compact
    def __call__(self, feats, mask=None, deterministic: bool = True):
        x = DimReduction(self.d_inner)(feats)                    # [B, N, L]
        a = AttentionGated(self.d_attn, 1)(x)                    # [B, 1, N]
        attn = masked_softmax(a, None if mask is None else mask[:, None, :])
        M = jnp.einsum("bkn,bnd->bkd", attn, x)[:, 0]            # [B, L]

        out = {"attn": a, "bag_feat": M}
        if self.n_confounder > 0:
            if self.confounder_init is not None:
                proto = jnp.asarray(np.asarray(self.confounder_init, np.float32))
            else:
                proto = None
            if self.confounder_learn:
                init = (lambda rng, shape: jnp.asarray(proto)) if proto is not None \
                    else nn.initializers.normal(1.0)
                confounders = self.param("confounder_feat", init,
                                         (self.n_confounder, self.d_inner))
            elif proto is not None:
                confounders = proto  # frozen dictionary baked as a constant
            else:
                confounders = self.param("confounder_feat",
                                         nn.initializers.normal(1.0),
                                         (self.n_confounder, self.d_inner))
            bag_q = TDense(self.confounder_dim, name="W_q")(M)          # [B, J]
            conf_k = TDense(self.confounder_dim, name="W_k")(confounders)  # [P, J]
            logits_pa = jnp.einsum("pj,bj->bp", conf_k, bag_q) / jnp.sqrt(
                jnp.asarray(self.confounder_dim, M.dtype))
            deconf_A = jax.nn.softmax(logits_pa, axis=-1)        # over prototypes
            conf_feat = deconf_A @ confounders                   # [B, L]
            if self.confounder_merge == "cat":
                M = jnp.concatenate([M, conf_feat], axis=-1)
            elif self.confounder_merge == "add":
                M = M + conf_feat
            else:
                M = M - conf_feat
            out["deconf_attn"] = deconf_A
        out["logits"] = Classifier1fc(self.n_class, self.droprate)(
            M, deterministic)
        return out


@register_model("ibmil")
def _ibmil(conf):
    n_conf = 0
    c_path = getattr(conf, "c_path", None)
    confounders = None
    if c_path:
        paths = c_path if isinstance(c_path, (list, tuple)) else [c_path]
        arrs = [np.load(p).reshape(-1, conf.D_inner) for p in paths]
        confounders = np.concatenate(arrs, 0).astype(np.float32)
        n_conf = len(confounders)
    return IBMIL(
        n_class=conf.n_class,
        d_inner=conf.D_inner,
        n_confounder=n_conf,
        confounder_merge=str(getattr(conf, "confounder_merge", "cat")),
        confounder_learn=bool(getattr(conf, "c_learn", False)),
        confounder_init=tuple(map(tuple, confounders)) if confounders is not None else None,
    )

"""CLAM-SB / CLAM-MB — attention MIL with instance-level clustering loss.

Reference: `architecture/clam.py` (`CLAM_SB:85`, `CLAM_MB:211`,
`inst_eval:128`, `inst_eval_out:147`). Loss mixing lives in the engine
(`engine.py:99-116`).

TPU-first reformulation of the instance loss: the reference's per-class
Python branch on ``label == c`` (data-dependent control flow) becomes a
one-hot-weighted sum over all classes — every class's in/out instance loss
is computed on fixed shapes and gated by ``one_hot(label)``. Top-k /
bottom-k selection uses masked ``lax.top_k`` gathers; bags shorter than
``2*k_sample`` down-weight the invalid gathered slots instead of failing.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
from functools import partial as _partial

# reference `initialize_weights`: xavier_normal weights + zero biases
# (training dynamics are init-sensitive — see
# common.torch_linear_uniform_init and PARITY.md r3)
from acmil_tpu.models.common import torch_xavier_normal as _txn
XDense = _partial(nn.Dense, kernel_init=_txn)
import jax
import jax.numpy as jnp

from acmil_tpu.models import register_model
from acmil_tpu.models.common import AttnNet, AttnNetGated
from acmil_tpu.ops.masked import NEG_INF, masked_fill, masked_softmax, softmax_one


def _topk_gather(scores, h, mask, k):
    """Gather features of the top-k valid scores. Returns (feats [B,k,L],
    slot_valid [B,k])."""
    s = masked_fill(scores, mask) if mask is not None else scores
    _, idx = jax.lax.top_k(s, k)                               # [B, k]
    feats = jnp.take_along_axis(h, idx[..., None], axis=1)     # [B, k, L]
    if mask is None:
        slot_valid = jnp.ones(idx.shape, bool)
    else:
        slot_valid = jnp.take_along_axis(mask, idx, axis=1)
    return feats, slot_valid


def _binary_ce(logits, target, slot_valid):
    """Mean CE of 2-way instance logits vs constant target, ignoring
    invalid gathered slots. logits [B,k,2]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -logp[..., target]
    w = slot_valid.astype(nll.dtype)
    return jnp.sum(nll * w, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1.0)  # [B]


def _binary_svm(logits, target, slot_valid):
    """Smooth top-1 SVM alternative instance loss (the reference's
    optional ``SmoothTop1SVM`` from `modules/clam.py:5`)."""
    from acmil_tpu.ops.topk_svm import smooth_top1_svm_loss

    b, k, _ = logits.shape
    labels = jnp.full((b, k), target, jnp.int32)
    losses = []
    for i in range(b):  # small static b; keeps per-bag weighting identical
        losses.append(smooth_top1_svm_loss(logits[i], labels[i],
                                           valid=slot_valid[i]))
    return jnp.stack(losses)


class _CLAMBase(nn.Module):
    n_class: int
    d_inner: int = 128      # size[1]
    d_attn: int = 128       # size[2] ("small": [D_feat, D_inner, 128])
    k_sample: int = 8
    gate: bool = True
    droprate: float = 0.25
    subtyping: Optional[bool] = None
    multi_branch: bool = False
    inst_loss: str = "ce"   # 'ce' | 'svm' (SmoothTop1SVM, modules/clam.py:5)

    def _subtyping(self):
        return self.n_class > 2 if self.subtyping is None else self.subtyping

    @nn.compact
    def __call__(self, feats, mask=None, label=None, instance_eval: bool = False,
                 deterministic: bool = True, attention_only: bool = False):
        B = feats.shape[0]
        h = nn.relu(XDense(self.d_inner)(feats))              # [B, N, L]
        if self.droprate > 0:
            h = nn.Dropout(self.droprate)(h, deterministic=deterministic)
        n_branch = self.n_class if self.multi_branch else 1
        attn_cls = AttnNetGated if self.gate else AttnNet
        a = attn_cls(self.d_attn, n_branch, self.droprate)(h, deterministic)  # [B, Kb, N]
        if attention_only:
            return a

        m = None if mask is None else mask[:, None, :]
        if self.multi_branch:
            A = softmax_one(a, m)                               # clam.py:248
        else:
            A = masked_softmax(a, m)

        M = jnp.einsum("bkn,bnd->bkd", A, h)                    # [B, Kb, L]
        if self.multi_branch:
            # per-class bag classifiers (clam.py:228-230): [C] heads of [L]->1
            # per-class Linear(L,1) stack: flax's xavier on [C,L] would
            # compute fans from the wrong axes (code-review r3 follow-up:
            # the class axis is a BATCH axis) — use the torch per-class
            # std sqrt(2/(L+1)) explicitly
            w = self.param(
                "bag_w",
                nn.initializers.normal((2.0 / (self.d_inner + 1)) ** 0.5),
                (self.n_class, self.d_inner))
            b = self.param("bag_b", nn.initializers.zeros, (self.n_class,))
            logits = jnp.einsum("bcd,cd->bc", M, w) + b
        else:
            logits = XDense(self.n_class)(M[:, 0])

        # per-class instance classifiers, stacked: [C, L, 2] — created
        # unconditionally so init() without instance_eval still makes them
        # stacked per-class Linear(L,2): leading class axis is a batch
        # axis; flax xavier on [C,L,2] computes fan_in=L*C (r3 bisection:
        # inst_w std 0.084 vs torch 0.123, enough to cost ~0.1 test AUC
        # on the h2h task) — exact torch xavier_normal std per class
        wc = self.param(
            "inst_w",
            nn.initializers.normal((2.0 / (self.d_inner + 2)) ** 0.5),
            (self.n_class, self.d_inner, 2))
        bc = self.param("inst_b", nn.initializers.zeros, (self.n_class, 2))

        out = {"logits": logits, "attn": a, "bag_feat": M}
        if instance_eval:
            out["instance_loss"] = self._instance_loss(A, h, mask, label, wc, bc)
        return out

    def _instance_loss(self, A, h, mask, label, wc, bc):
        """Fixed-shape version of clam.py:128-157 + the forward's per-class
        loop (clam.py:172-189)."""
        assert label is not None, "instance_eval requires labels"
        k = self.k_sample
        onehot = jax.nn.one_hot(label, self.n_class)            # [B, C]
        losses_in = []
        losses_out = []
        loss_fn = _binary_svm if self.inst_loss == "svm" else _binary_ce
        for c in range(self.n_class):
            Ac = A[:, c] if self.multi_branch else A[:, 0]      # [B, N]
            top_p, v_p = _topk_gather(Ac, h, mask, k)
            top_n, v_n = _topk_gather(-Ac, h, mask, k)
            logit_p = jnp.einsum("bkd,dt->bkt", top_p, wc[c]) + bc[c]
            logit_n = jnp.einsum("bkd,dt->bkt", top_n, wc[c]) + bc[c]
            # in-the-class: top-k → positive, bottom-k → negative
            in_loss = 0.5 * (loss_fn(logit_p, 1, v_p) + loss_fn(logit_n, 0, v_n))
            # out-of-class (subtyping): top-k → negative
            out_loss = loss_fn(logit_p, 0, v_p)
            losses_in.append(in_loss)
            losses_out.append(out_loss)
        in_l = jnp.stack(losses_in, axis=-1)                    # [B, C]
        out_l = jnp.stack(losses_out, axis=-1)
        total = jnp.sum(onehot * in_l, axis=-1)
        if self._subtyping():
            total = (total + jnp.sum((1 - onehot) * out_l, axis=-1)) / self.n_class
        if mask is not None:
            # average over REAL bags only: padded all-False-mask batch rows
            # contribute 0 and a plain mean would dilute the instance term
            # relative to the valid-weighted bag CE it is mixed with
            valid = mask.any(axis=1).astype(total.dtype)        # [B]
            return jnp.sum(total * valid) / jnp.maximum(valid.sum(), 1.0)
        return jnp.mean(total)


class CLAM_SB(_CLAMBase):
    """Single attention branch (`clam.py:85`)."""

    multi_branch: bool = False


class CLAM_MB(_CLAMBase):
    """Per-class attention branches + per-class bag classifiers with
    softmax_one normalisation (`clam.py:211-248`)."""

    multi_branch: bool = True


@register_model("clam_sb", family="clam")
def _clam_sb(conf):
    # droprate configurable so `droprate: 0` can take the fused train
    # path (reference default = dropout 0.25, `clam.py:86`)
    return CLAM_SB(n_class=conf.n_class, d_inner=conf.D_inner,
                   droprate=float(getattr(conf, "droprate", 0.25)),
                   inst_loss=str(getattr(conf, "inst_loss", "ce")))


@register_model("clam_mb", family="clam")
def _clam_mb(conf):
    return CLAM_MB(n_class=conf.n_class, d_inner=conf.D_inner,
                   droprate=float(getattr(conf, "droprate", 0.25)),
                   inst_loss=str(getattr(conf, "inst_loss", "ce")))

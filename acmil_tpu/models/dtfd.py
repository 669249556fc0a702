"""DTFD-MIL — two-tier pseudo-bag MIL with instance distillation.

Reference: `Step3_WSI_classification_DTFD.py:61-160` (training loop) and
`architecture/Attention.py` (`Attention_Gated:29`,
`Attention_with_Classifier:62`); CAM trick `utils/utils.py:48`.

Algorithm per slide: randomly partition the bag into ``num_group``
pseudo-bags; tier-1 = gated-attention pooling + classifier per pseudo-bag
(CE vs the slide label); distill per-group instances by per-patch CAM
logits (MaxMinS = top-k + bottom-k features, MaxS = top-k, AFS =
attention-pooled feature); tier-2 = gated-attention classifier over the
distilled features (CE vs slide label).

TPU-first reformulation (SURVEY.md §7 hard parts):
- the random ``randperm`` + ``tensor_split`` becomes one fixed-shape
  argsort-of-uniforms permutation reshaped to ``[G, N/G]``; padded slots
  ride along with mask=False and land uniformly across groups, matching
  the reference's uniform assignment of real patches in expectation;
- the reference's two optimizers + ``retain_graph`` backward become a
  single jit step: tier-2 consumes ``stop_gradient``'d distilled features,
  so tier-1 params receive gradients only from the tier-1 loss and the
  tier-2 head only from the tier-2 loss — exactly the reference's update
  (tier-2 gradients into tier-1 params were zeroed before ever stepping);
- eval pseudo-bags use a deterministic fold of the bag as "rng"
  (the reference re-randomises at every eval, making metrics stochastic).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from acmil_tpu.engine.families import Family, register_family
from acmil_tpu.engine import losses as L
from acmil_tpu.models import register_model
from acmil_tpu.models.common import (AttentionGated, Classifier1fc,
                                     DimReduction,
                                     torch_linear_uniform_init)
from acmil_tpu.ops.masked import masked_fill, masked_softmax


def _group_permutation(rng, mask, num_group):
    """[B, N] -> group member indices [B, G, N/G] + gathered validity."""
    b, n = mask.shape
    assert n % num_group == 0, (n, num_group)
    u = jax.random.uniform(rng, (b, n))
    perm = jnp.argsort(u, axis=-1)                              # [B, N]
    groups = perm.reshape(b, num_group, n // num_group)
    gmask = jnp.take_along_axis(mask[:, None, :].repeat(num_group, 1),
                                groups, axis=-1)
    return groups, gmask


class DTFD(nn.Module):
    """Single module holding both tiers (reference keeps 4 separate
    nn.Modules wired through the script)."""

    n_class: int
    d_inner: int = 128
    d_attn: int = 128
    num_group: int = 4
    instance_per_group: int = 1
    distill: str = "MaxMinS"
    droprate: float = 0.0

    @nn.compact
    def __call__(self, feats, mask=None, deterministic: bool = True,
                 rng: Optional[jax.Array] = None):
        b, n, _ = feats.shape
        g = self.num_group
        if mask is None:
            mask = jnp.ones((b, n), bool)

        if rng is None:
            if not deterministic:
                rng = self.make_rng("stkim")  # shared stochastic-ops stream
            else:
                rng = jax.random.PRNGKey(0)  # deterministic eval grouping

        mid = DimReduction(self.d_inner)(feats)                  # [B, N, L]
        attn_net = AttentionGated(self.d_attn, 1)

        groups, gmask = _group_permutation(rng, mask, g)         # [B,G,S]
        s = groups.shape[-1]
        gfeat = jnp.take_along_axis(mid[:, None].repeat(g, 1),
                                    groups[..., None], axis=2)   # [B,G,S,L]

        a = attn_net(gfeat.reshape(b * g, s, -1)).reshape(b, g, s)  # logits
        attn = masked_softmax(a, gmask)                          # [B,G,S]
        att_feats = gfeat * attn[..., None]                      # [B,G,S,L]
        pooled = att_feats.sum(axis=2)                           # [B,G,L]

        # tier-1 classifier, kernel exposed for the CAM trick
        # torch nn.Linear default init — reference dynamics are
        # init-sensitive (see common.torch_linear_uniform_init)
        t_init = torch_linear_uniform_init(self.d_inner ** -0.5)
        w1 = self.param("tier1_w", t_init, (self.d_inner, self.n_class))
        b1 = self.param("tier1_b", t_init, (self.n_class,))
        sub_preds = pooled @ w1 + b1                             # [B,G,C]

        # CAM per-patch logits: attn-weighted feats @ classifier weight,
        # NO bias (get_cam_1d, utils.py:48)
        cam = att_feats @ w1                                     # [B,G,S,C]
        patch_prob = jax.nn.softmax(cam, axis=-1)[..., -1]       # [B,G,S]

        k = min(self.instance_per_group, s)
        score = masked_fill(patch_prob, gmask)
        _, top_idx = jax.lax.top_k(score, k)                     # [B,G,k]
        neg_score = masked_fill(-patch_prob, gmask)
        _, bot_idx = jax.lax.top_k(neg_score, k)

        def gather_feats(idx):
            return jnp.take_along_axis(gfeat, idx[..., None], axis=2)

        def gather_mask(idx):
            return jnp.take_along_axis(gmask, idx, axis=2)

        if self.distill == "MaxMinS":
            d_idx = jnp.concatenate([top_idx, bot_idx], axis=-1)
            d_feat = gather_feats(d_idx).reshape(b, g * 2 * k, -1)
            d_mask = gather_mask(d_idx).reshape(b, g * 2 * k)
        elif self.distill == "MaxS":
            d_feat = gather_feats(top_idx).reshape(b, g * k, -1)
            d_mask = gather_mask(top_idx).reshape(b, g * k)
        else:  # AFS: the attention-pooled feature per group
            d_feat = pooled
            d_mask = gmask.any(axis=-1)

        # tier-2: gated attention + classifier over stop-gradient features
        # (Attention_with_Classifier, Attention.py:62)
        d_feat = jax.lax.stop_gradient(d_feat)
        a2 = AttentionGated(self.d_attn, 1)(d_feat)              # [B,1,M]
        attn2 = masked_softmax(a2, d_mask[:, None, :])
        slide_feat = jnp.einsum("bkm,bml->bkl", attn2, d_feat)[:, 0]
        slide_preds = Classifier1fc(self.n_class, self.droprate)(
            slide_feat, deterministic)

        return {
            "logits": slide_preds,                               # tier-2
            "sub_preds": sub_preds,                              # [B,G,C]
            "group_valid": gmask.any(axis=-1),                   # [B,G]
            "attn": masked_fill(a, gmask),                       # [B,G,S]
        }


class DTFDFamily(Family):
    """loss = CE(tier-1 per-group) stepped on tier-1 params +
    CE(tier-2) on the tier-2 head (`Step3_DTFD:131-148`); eval prob =
    softmax(tier-2) (`Step3_DTFD:222-226`).

    Fused routing (VERDICT r3 item 2, last of SURVEY §7's five pooling
    heads): the per-pseudo-bag gated-attention pooling can run the
    streaming Pallas kernel (models/fast.py::dtfd_apply_fused), gated on
    the per-group length ``N / num_group`` (the kernel streams groups as
    independent bags, so the GROUP size is what it sees). The gate
    (``fast.DTFD_FUSE_MIN_S``) defaults to OFF: measured 0.89-0.94x at
    every size up to N=262k on v5e (BENCH_NOTES r4 — DTFD pools the
    narrow dim-reduced array, so XLA never hits the wide-activation
    cliff CLAM/DSMIL's kernels win on). Mesh runs and residual-block
    reductions keep model.apply."""

    name = "dtfd"

    def conf_dict(self, conf):
        # mirrors the `_dtfd` factory below — keep in sync
        d = super().conf_dict(conf)
        num_group = int(getattr(conf, "numGroup", 4))
        total_instance = int(getattr(conf, "total_instance", 4))
        d["num_group"] = num_group
        d["instance_per_group"] = max(1, total_instance // num_group)
        d["distill"] = str(getattr(conf, "distill", "MaxMinS"))
        d["fused"] = bool(conf.extra.get("fused_train", True))
        d["droprate"] = float(getattr(conf, "droprate", 0.0))
        return d

    @staticmethod
    def _fused_ok(params, bag, conf_d):
        from acmil_tpu.models import fast

        # droprate guards like ACMILFamily's dropout fallback: dropout
        # has no params so dtfd_is_fusable can't see it — the fused path
        # would silently skip it (ADVICE r4)
        return (conf_d.get("fused", False) and conf_d.get("mesh") is None
                and conf_d.get("droprate", 0.0) == 0.0
                and fast.DTFD_FUSE_MIN_S is not None
                and fast.dtfd_is_fusable(params)
                and bag.feats.shape[1] % conf_d["num_group"] == 0
                and (bag.feats.shape[1] // conf_d["num_group"]
                     >= fast.DTFD_FUSE_MIN_S))

    @staticmethod
    def _fused_kw(conf_d):
        return dict(num_group=conf_d["num_group"],
                    instance_per_group=conf_d["instance_per_group"],
                    distill=conf_d["distill"])

    def train_outputs(self, apply_fn, params, bag, rngs, conf_d):
        if self._fused_ok(params, bag, conf_d):
            from acmil_tpu.models import fast

            return fast.dtfd_apply_fused(
                params, bag.feats, bag.mask,
                rng=fast.derive_stkim_rng(rngs["stkim"]),
                **self._fused_kw(conf_d))
        return super().train_outputs(apply_fn, params, bag, rngs, conf_d)

    def eval_outputs(self, apply_fn, params, bag, fused: bool = True,
                     mesh=None, model=None):
        # hyperparams come from the module itself (engine/train.py's
        # _eval_outputs_fn passes the model to families that take it)
        if fused and mesh is None and model is not None:
            conf_d = {"fused": True, "mesh": None,
                      "num_group": model.num_group,
                      "instance_per_group": model.instance_per_group,
                      "distill": model.distill,
                      # eval is deterministic — dropout is inert on both
                      # paths, so the fused kernel stays valid at any
                      # droprate (the train gate checks the real value)
                      "droprate": 0.0}
            if self._fused_ok(params, bag, conf_d):
                from acmil_tpu.models import fast

                return fast.dtfd_apply_fused(params, bag.feats, bag.mask,
                                             **self._fused_kw(conf_d))
        return super().eval_outputs(apply_fn, params, bag)

    def loss(self, outputs, bag, valid, conf_d):
        sub = outputs["sub_preds"]                               # [B,G,C]
        b, g, c = sub.shape
        gvalid = outputs["group_valid"] & valid[:, None]
        loss0 = L.cross_entropy(sub.reshape(b * g, c),
                                jnp.repeat(bag.label, g),
                                gvalid.reshape(b * g))
        loss1 = L.cross_entropy(outputs["logits"], bag.label, valid)
        return loss0 + loss1, {"loss0": loss0, "loss1": loss1}

    def make_tx(self, conf, sched):
        """Reference optimizer semantics (`Step3_DTFD:131-148`): plain
        ``torch.optim.Adam(weight_decay=wd)`` — COUPLED L2 decay added
        to the (clipped) gradient before the Adam moments, NOT AdamW —
        and per-module ``clip_grad_norm_(grad_clipping)``. The two
        reference optimizers are elementwise-identical to one Adam over
        the disjoint union; loss0/loss1 gradients are disjoint by
        ``stop_gradient``, so clipping the joint gradient per module
        equals the reference's per-loss clipping."""
        import optax

        from acmil_tpu.engine.train import clip_by_module_norms

        def group_of(k):
            # tier-2 Attention_with_Classifier = one reference module
            if k in ("AttentionGated_1", "Classifier1fc_0"):
                return "u_classifier"
            if k.startswith("tier1"):                 # Classifier_1fc
                return "classifier"
            return k          # DimReduction_0 / AttentionGated_0 each own

        inner = optax.flatten(optax.chain(
            optax.add_decayed_weights(float(conf.wd)),
            optax.adam(sched)))
        raw = getattr(conf, "grad_clipping", None)
        clip = 5.0 if raw is None else float(raw)  # reference CLI default
        if not clip:
            return inner                           # explicit 0 disables
        return optax.chain(clip_by_module_norms(clip, group_of), inner)


register_family(DTFDFamily())


@register_model("dtfd", family="dtfd")
def _dtfd(conf):
    num_group = int(getattr(conf, "numGroup", 4))
    total_instance = int(getattr(conf, "total_instance", 4))
    return DTFD(
        n_class=conf.n_class,
        d_inner=conf.D_inner,
        num_group=num_group,
        instance_per_group=max(1, total_instance // num_group),
        distill=str(getattr(conf, "distill", "MaxMinS")),
        droprate=float(getattr(conf, "droprate", 0.0)),
    )

"""Per-architecture training families.

The reference dispatches losses with isinstance/arch-string chains inside
`engine.py:143-154` and per-script loops. Here each family is a small
strategy object: how to run the forward in training, how to turn outputs
into a loss, and how to turn deterministic outputs into eval probabilities
(`engine.py:175-197` — e.g. DSMIL averages instance-max and bag softmax).

Families with genuinely different step structure (DTFD's two-tier/two-
optimizer step, MHIM's EMA teacher) override ``make_train_step`` wholesale.
"""

from __future__ import annotations

from typing import Any, Dict

import jax

from acmil_tpu.data.bags import Bag
from acmil_tpu.engine import losses as L


class Family:
    """Default: model returns slide logits; loss = CE."""

    name = "default"

    def conf_dict(self, conf) -> Dict[str, Any]:
        return {
            "n_token": getattr(conf, "n_token", 1),
            "n_class": conf.n_class,
            "w_loss": float(getattr(conf, "w_loss", 0.7)),
        }

    # -- training forward ---------------------------------------------------
    def train_outputs(self, apply_fn, params, bag: Bag, rngs, conf_d):
        return apply_fn({"params": params}, bag.feats, bag.mask,
                        deterministic=False, rngs=rngs)

    # -- loss ---------------------------------------------------------------
    def loss(self, outputs, bag: Bag, valid, conf_d):
        logits = outputs["logits"] if isinstance(outputs, dict) else outputs
        loss = L.cross_entropy(logits, bag.label, valid)
        return loss, {"ce_loss": loss}

    # -- eval ---------------------------------------------------------------
    def eval_outputs(self, apply_fn, params, bag: Bag):
        return apply_fn({"params": params}, bag.feats, bag.mask,
                        deterministic=True)

    def probs(self, outputs):
        if isinstance(outputs, dict):
            logits = outputs["logits"]
        elif isinstance(outputs, tuple):
            logits = outputs[1]  # (sub, slide, attn) convention
        else:
            logits = outputs
        return jax.nn.softmax(logits, axis=-1)


class ACMILFamily(Family):
    """(sub, slide, attn) triple; branch CE + slide CE + diversity
    (`Step3_WSI_classification_ACMIL.py:199-216`).

    With ``fused_train`` on, the GA head's forward runs the fused Pallas
    pooling kernel with a fused one-pass backward
    (models/fast.py::acmil_ga_apply_batched). STKIM applies as an O(K·k)
    correction on the pooled output, so the paper's flagship recipe
    (`n_token=5 n_masked_patch=10 mask_drop=0.6`) keeps the fused
    speedup; only dropout > 0 falls back to model.apply. Mesh runs route
    through the (data, seq)-sharded kernel."""

    name = "acmil"

    def conf_dict(self, conf):
        d = super().conf_dict(conf)
        # default ON; `fused_train: false` opts out.
        d["fused"] = (bool(conf.extra.get("fused_train", True))
                      and float(conf.extra.get("droprate", 0.0)) == 0.0)
        d["n_masked_patch"] = int(getattr(conf, "n_masked_patch", 0))
        d["mask_drop"] = float(getattr(conf, "mask_drop", 0.0))
        return d

    @staticmethod
    def _fused_ok(params, conf_d):
        return conf_d.get("fused", False) and "AttentionGated_0" in params

    def train_outputs(self, apply_fn, params, bag, rngs, conf_d):
        if self._fused_ok(params, conf_d):
            from acmil_tpu.models.fast import (acmil_ga_apply_batched,
                                               derive_stkim_rng)

            nm, md = conf_d["n_masked_patch"], conf_d["mask_drop"]
            srng = (derive_stkim_rng(rngs["stkim"])
                    if nm > 0 and md > 0 else None)
            return acmil_ga_apply_batched(
                params, bag.feats, bag.mask, stkim_rng=srng,
                n_masked_patch=nm, mask_drop=md, mesh=conf_d.get("mesh"))
        return super().train_outputs(apply_fn, params, bag, rngs, conf_d)

    def eval_outputs(self, apply_fn, params, bag, fused: bool = True,
                     mesh=None):
        # eval is always deterministic (no STKIM/dropout), so the fused
        # kernel is valid for every GA-structured param tree. With a mesh
        # the pooling runs the shard_map'd kernel (a bare pallas_call
        # cannot consume sharded operands); ``fused=False`` keeps the
        # plain model.apply graph.
        if fused and "AttentionGated_0" in params:
            from acmil_tpu.models.fast import acmil_ga_apply_batched

            return acmil_ga_apply_batched(params, bag.feats, bag.mask,
                                          mesh=mesh)
        return super().eval_outputs(apply_fn, params, bag)

    def loss(self, outputs, bag, valid, conf_d):
        sub, slide, attn = outputs
        return L.acmil_loss(sub, slide, attn, bag.label, bag.mask,
                            conf_d["n_token"], valid)

    def probs(self, outputs):
        return jax.nn.softmax(outputs[1], axis=-1)


class CLAMFamily(Family):
    """Bag CE mixed with the instance clustering loss
    (`engine.py:99-116`: ``w_loss * bag + (1 - w_loss) * instance``).
    The model needs labels for in/out-of-class instance supervision.

    Fused routing (VERDICT r3 item 2): CLAM's ``Attn_Net_Gated`` is the
    same gated-attention computation as the Pallas pooling kernel
    (`architecture/clam.py:46-67`), so eval runs fused at large buckets
    (deterministic — dropout off), and training runs fused when
    ``droprate: 0`` and the instance loss is CE (the reference default
    trains with dropout 0.25, which keeps model.apply). MB's softmax_one
    pooling uses the phantom-logit kernel variant. Mesh runs keep
    model.apply (the bare kernel cannot consume sharded operands), and
    buckets under ``fast.FUSE_MIN_N`` patches keep it too — the plain
    graph is faster there (BENCH_NOTES r4 crossover)."""

    name = "clam"

    def conf_dict(self, conf):
        d = super().conf_dict(conf)
        d["fused"] = (bool(conf.extra.get("fused_train", True))
                      and float(getattr(conf, "droprate", 0.25)) == 0.0
                      and str(getattr(conf, "inst_loss", "ce")) == "ce")
        d["k_sample"] = int(getattr(conf, "k_sample", 8))
        sub = getattr(conf, "subtyping", None)
        d["subtyping"] = (conf.n_class > 2) if sub is None else bool(sub)
        return d

    @staticmethod
    def _fused_kw(conf_d):
        return dict(n_class=conf_d["n_class"], k_sample=conf_d["k_sample"],
                    subtyping=conf_d["subtyping"])

    def train_outputs(self, apply_fn, params, bag, rngs, conf_d):
        if conf_d.get("fused") and conf_d.get("mesh") is None:
            from acmil_tpu.models import fast

            if (fast.clam_is_fusable(params)
                    and bag.feats.shape[1] >= fast.FUSE_MIN_N):
                return fast.clam_apply_fused(params, bag.feats, bag.mask,
                                             label=bag.label,
                                             instance_eval=True,
                                             **self._fused_kw(conf_d))
        return apply_fn({"params": params}, bag.feats, bag.mask,
                        label=bag.label, instance_eval=True,
                        deterministic=False, rngs=rngs)

    def eval_outputs(self, apply_fn, params, bag, fused: bool = True,
                     mesh=None):
        if fused and mesh is None:
            from acmil_tpu.models import fast

            if (fast.clam_is_fusable(params)
                    and bag.feats.shape[1] >= fast.FUSE_MIN_N):
                return fast.clam_apply_fused(params, bag.feats, bag.mask,
                                             n_class=0)
        return super().eval_outputs(apply_fn, params, bag)

    def loss(self, outputs, bag, valid, conf_d):
        logits, inst_loss = outputs["logits"], outputs["instance_loss"]
        bag_loss = L.cross_entropy(logits, bag.label, valid)
        w = conf_d["w_loss"]
        return w * bag_loss + (1 - w) * inst_loss, {
            "bag_loss": bag_loss, "instance_loss": inst_loss}


class DSMILFamily(Family):
    """(inst_logits, bag_logits, attn): 0.5 CE(masked-max inst) + 0.5 CE(bag)
    (`engine.py:41-56`); eval probs = mean of the two softmaxes
    (`engine.py:176-182`)."""

    name = "dsmil"

    def _max_inst(self, outputs, bag):
        from acmil_tpu.ops.masked import masked_max

        inst, bag_logits, attn = outputs
        return masked_max(inst, bag.mask, axis=1), bag_logits

    def loss(self, outputs, bag, valid, conf_d):
        max_preds, bag_logits = self._max_inst(outputs, bag)
        ce = 0.5 * L.cross_entropy(max_preds, bag.label, valid) \
            + 0.5 * L.cross_entropy(bag_logits, bag.label, valid)
        # reference adds w_loss * pairwise attention diversity when
        # n_token > 1 (`engine.py:50-58`)
        n_tok = min(conf_d["n_token"], outputs[2].shape[1])
        div = L.attention_diversity_loss(outputs[2][:, :n_tok], bag.mask,
                                         n_tok, valid)
        loss = ce + conf_d["w_loss"] * div
        return loss, {"ce_loss": ce, "diff_loss": div}

    def eval_outputs(self, apply_fn, params, bag, fused: bool = True,
                     mesh=None):
        # fused bag-head pooling (ops/dsmil_pool.py) for the generic
        # trainer's nonlinear=False build; mesh runs keep model.apply,
        # as do buckets under the measured crossover (fast.FUSE_MIN_N)
        if fused and mesh is None:
            from acmil_tpu.models import fast

            if (fast.dsmil_is_fusable(params)
                    and bag.feats.shape[1] >= fast.FUSE_MIN_N):
                return fast.dsmil_eval_fused(params, bag.feats, bag.mask)
        out = apply_fn({"params": params}, bag.feats, bag.mask,
                       deterministic=True)
        return self._max_inst(out, bag)

    def probs(self, outputs):
        max_preds, bag_logits = outputs
        return 0.5 * jax.nn.softmax(max_preds, -1) + 0.5 * jax.nn.softmax(bag_logits, -1)


class BMILFamily(Family):
    """CE + 1e-8 * model ARD KL + 1e-6 * data KL (`engine.py:74-96`).
    The data KL comes back in the output dict; the model (ARD) KL is sown
    by each LinearVDO into the 'kl' collection (the jit-able version of
    `get_ard_reg_vdo`'s module traversal, `bmil.py:446`)."""

    name = "bmil"

    def _merge_kl(self, out_and_vars):
        out, muts = out_and_vars
        kl_leaves = jax.tree_util.tree_leaves(muts.get("kl", {}))
        if kl_leaves:
            out = dict(out)
            out["kl_model"] = sum(kl_leaves)
        return out

    def train_outputs(self, apply_fn, params, bag, rngs, conf_d):
        return self._merge_kl(apply_fn(
            {"params": params}, bag.feats, bag.mask,
            coords=bag.coords, label=bag.label,
            deterministic=False, rngs=rngs, mutable=["kl"]))

    def loss(self, outputs, bag, valid, conf_d):
        ce = L.cross_entropy(outputs["logits"], bag.label, valid)
        loss = ce + 1e-8 * outputs["kl_model"] + 1e-6 * outputs["kl_data"]
        return loss, {"ce_loss": ce, "kl_model": outputs["kl_model"],
                      "kl_data": outputs["kl_data"]}

    def eval_outputs(self, apply_fn, params, bag):
        return self._merge_kl(apply_fn(
            {"params": params}, bag.feats, bag.mask,
            coords=bag.coords, deterministic=True, mutable=["kl"]))


FAMILIES: Dict[str, Family] = {
    f.name: f for f in [Family(), ACMILFamily(), CLAMFamily(), DSMILFamily(),
                        BMILFamily()]
}


def get_family(name: str) -> Family:
    return FAMILIES[name]


def register_family(family: Family) -> None:
    FAMILIES[family.name] = family

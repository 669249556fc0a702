"""MHIM — masked hard instance mining with an EMA teacher.

Reference: `modules/mhim.py` (`MHIM:36`, `select_mask_fn:79`,
`get_mask:139`), `modules/satten.py` (`SAttention:30` — 2-layer Nystrom
transformer with cls token + PPEG), `modules/datten.py` (`DAttention:85`),
training loop `Step3_WSI_classification_MHIM.py:97-161` (teacher forward,
EMA update `utils/utils.py:604`, cosine mm/mask-ratio schedules
`utils/utils.py:529`).

TPU-first reformulation of the masking machinery (SURVEY.md §7):
the reference shrinks the sequence MAE-style (topk → set-difference →
gather to a dynamic ``len_keep`` prefix, `modules/mhim.py:120-137` +
`satten.py:53-74`) — all dynamic shapes. Here every mask is a boolean
compose over the static padded bag:

- *rank trick*: "drop ceil(ps·r) patches by score" becomes
  ``rank(score) < ps·r`` where ``rank`` is argsort-of-argsort and ``ps``
  is the (traced) valid count — no data-dependent shapes anywhere;
- random masking = rank over iid uniforms; low/high-attention masking =
  rank over teacher attention; the high-attention random subset
  (``mask_ratio_hr``) re-ranks inside the selected set by fresh noise;
- multi-head 'vote' fusion (`mhim.py:101-113`) = per-head top-k
  indicators summed, then ranked.

Because encoders are mask-aware, clearing a patch's mask bit is exactly
the reference's "remove it from the sequence".
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

from acmil_tpu.engine.families import Family, register_family
from acmil_tpu.engine import losses as L
from acmil_tpu.models import register_model
from acmil_tpu.models.transmil import PPEG, TransLayer, _grid_shape
from acmil_tpu.ops.masked import masked_fill, masked_softmax


# ---------------------------------------------------------------------------
# rank-based masking
# ---------------------------------------------------------------------------

def _rank(scores: jnp.ndarray, valid: jnp.ndarray, largest: bool) -> jnp.ndarray:
    """Dense rank (0 = best) of valid entries along the last axis; invalid
    entries rank worst."""
    s = jnp.where(valid, scores, -jnp.inf if largest else jnp.inf)
    order = jnp.argsort(-s if largest else s, axis=-1)
    rank = jnp.argsort(order, axis=-1)
    return rank


def select_drop_mask(scores, valid, frac, largest, rng=None, random_frac=1.0):
    """Boolean drop-mask over the bag: the top (or bottom) ``ceil(ps*frac)``
    scored valid patches — optionally only a random ``random_frac`` subset
    of a ``frac/random_frac``-sized candidate set (`select_mask_fn`,
    `modules/mhim.py:79-120`)."""
    ps = valid.sum(axis=-1, keepdims=True).astype(jnp.float32)
    if random_frac >= 1.0:
        k = jnp.ceil(ps * frac)
        rank = _rank(scores, valid, largest)
        return (rank < k) & valid
    # candidate set of size ceil(ps * frac / random_frac), clamped to ps
    cand_frac = jnp.minimum(frac / max(random_frac, 1e-8), 1.0)
    k_cand = jnp.ceil(ps * cand_frac)
    cand = (_rank(scores, valid, largest) < k_cand) & valid
    # drop a random subset of ceil(ps * frac) inside the candidates
    noise = jax.random.uniform(rng, scores.shape)
    k_drop = jnp.ceil(ps * frac)
    nrank = _rank(noise, cand, largest=False)
    return (nrank < k_drop) & cand


def fuse_heads_vote(attn: jnp.ndarray, valid: jnp.ndarray, frac: float) -> jnp.ndarray:
    """'vote' MSA fusion (`mhim.py:101-113`): each head nominates its
    top-k; patches are scored by vote count."""
    ps = valid.sum(axis=-1, keepdims=True).astype(jnp.float32)[:, None]
    k = jnp.ceil(ps * frac)
    rank_h = _rank(attn, valid[:, None, :], largest=True)       # [B,H,N]
    votes = (rank_h < k).sum(axis=1).astype(jnp.float32)        # [B,N]
    return votes


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------

class SAttentionEncoder(nn.Module):
    """2-layer Nystrom transformer encoder with cls token + pluggable
    positional embedding (`modules/satten.py:30-122`; ``pos`` options at
    `:40-48`: ppeg / peg / sincos / none). Returns (cls_feat, per-layer
    cls attention [2][B, N])."""

    dim: int = 512
    heads: int = 8
    pos: str = "ppeg"
    dtype: jnp.dtype = jnp.float32
    # 'wrap': strict reference numerics for serving imported torch
    # checkpoints — Nystrom front-pads attend as real rows
    # (`nystrom_attention.py:73`) and the PPEG grid is filled by
    # wrapping the sequence (`modules/emb_position.py:18-25`) modulo the
    # per-bag valid count, windowed to the reference's ⌈√nv⌉² grid like
    # TransMIL's wrap branch. Reference-EXACT at natural length (the
    # reference never pads bags); under bucket padding it stays
    # mask-correct (garbage in padded slots is inert) but the Nystrom
    # landmark segmentation follows the bucket length, so logits drift
    # from natural-length serving — serve imported checkpoints at small
    # min_bucket when exactness matters. Default 'zero' keeps the
    # TPU-first masked-zero behaviour.
    pad_mode: str = "zero"

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True,
                 return_attn: bool = False):
        b, n, _ = x.shape
        strict = self.pad_mode == "wrap"
        if strict and self.pos != "ppeg":
            raise ValueError(
                "pad_mode='wrap' implements the reference's PPEG grid "
                "wrapping only; use pad_mode='zero' with pos="
                f"{self.pos!r}")
        gh, gw = _grid_shape(n, square=strict)
        grid_n = gh * gw
        if mask is None:
            mask = jnp.ones((b, n), bool)
        if grid_n > n and not strict:
            x = jnp.pad(x, ((0, 0), (0, grid_n - n), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, grid_n - n)))
        x = x * mask[..., None].astype(x.dtype)

        cls_tok = self.param("cls_token", nn.initializers.normal(1.0),
                             (1, 1, self.dim))
        h = jnp.concatenate([jnp.broadcast_to(cls_tok, (b, 1, self.dim)), x], 1)
        fmask = jnp.concatenate([jnp.ones((b, 1), bool), mask], axis=1)

        def rezero(t):
            return t * fmask[..., None].astype(t.dtype)

        def translayer():
            return TransLayer(self.dim, self.dtype, strict_pad=strict,
                              kernel_init=_txn,
                              bias_init=nn.initializers.zeros)

        attns = []
        if return_attn:
            h, a1 = translayer()(h, fmask, deterministic,
                                 return_attn_rows=1)
            attns.append(a1[:, 0, 1:1 + n])
        else:
            h = translayer()(h, fmask, deterministic)
        if self.pos == "ppeg" and strict:
            # reference PPEG grid handling (`emb_position.py:12-39`): wrap
            # the body to the square grid, zero-fill up to 7x7 if smaller,
            # conv, truncate back to n; cls stays untouched. Like
            # TransMIL's wrap branch, the wrap runs modulo the per-bag
            # VALID count (collated bags are valid-prefix), so a
            # bucket-padded bag duplicates its leading valid patches the
            # way the reference's torch.cat does at natural length —
            # NOT its zero pad slots (code-review r5). Exactly the
            # reference when n == n_valid; pad slots are re-zeroed after
            # the conv so they stay inert.
            nv = jnp.maximum(mask.sum(-1).astype(jnp.int32), 1)      # [B]
            j = jnp.arange(grid_n)[None, :]                          # [1,g]
            idx = j % nv[:, None]                                    # [B,g]
            body = jnp.take_along_axis(h[:, 1:], idx[..., None], axis=1)
            # wrap only up to the reference's per-bag ⌈√nv⌉² window and
            # zero the bucket surplus, like TransMIL's wrap branch —
            # otherwise bucket-padded bags over-duplicate and the convs
            # bleed extra copies into real positions
            ref_g = jnp.ceil(jnp.sqrt(nv.astype(jnp.float32))).astype(
                jnp.int32)
            ref_n = jnp.minimum(ref_g * ref_g, grid_n)               # [B]
            body = body * (j < ref_n[:, None])[..., None].astype(body.dtype)
            if gh < 7:
                body = jnp.pad(body, ((0, 0), (0, 49 - grid_n), (0, 0)))
                gh = gw = 7
            hp = PPEG(self.dim)(jnp.concatenate([h[:, :1], body], 1), gh, gw)
            h = rezero(jnp.concatenate([h[:, :1], hp[:, 1:1 + n]], axis=1))
        elif self.pos == "ppeg":
            h = rezero(PPEG(self.dim)(rezero(h), gh, gw))
        elif self.pos in ("peg", "sincos"):
            from acmil_tpu.models.emb_position import PEG, SINCOS

            emb = PEG(self.dim) if self.pos == "peg" else SINCOS(self.dim)
            # rezero BEFORE the positional conv too (like the ppeg branch):
            # masked slots are nonzero after TransLayer and PEG's 7x7
            # depthwise conv would bleed them into valid grid neighbours
            body = emb(rezero(h)[:, 1:], gh, gw)
            h = rezero(jnp.concatenate([h[:, :1], body], axis=1))
        if return_attn:
            h, a2 = translayer()(h, fmask, deterministic,
                                 return_attn_rows=1)
            attns.append(a2[:, 0, 1:1 + n])
        else:
            h = translayer()(h, fmask, deterministic)
        cls_feat = nn.LayerNorm()(h[:, 0])
        if return_attn:
            return cls_feat, attns
        return cls_feat


class DAttentionEncoder(nn.Module):
    """Attention-pooling encoder, faithful to `modules/datten.py`:
    ``DAttention(input_dim, act, gated=False, bias=False)`` — two
    bias-free Dense layers (D=128), activation per ``act`` (the reference
    MHIM passes ``da_act``, default gelu), optional tanh·sigmoid gate
    (`datten.py:40-84`)."""

    dim: int = 512
    gated: bool = False
    act: str = "gelu"

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True,
                 return_attn: bool = False):
        act = {"gelu": nn.gelu, "relu": nn.relu, "tanh": jnp.tanh}[self.act]
        if self.gated:
            av = act(XDense(128, use_bias=False)(x))
            au = nn.sigmoid(XDense(128, use_bias=False)(x))
            a = XDense(1, use_bias=False)(av * au)            # [B,N,1]
        else:
            h = act(XDense(128, use_bias=False)(x))
            a = XDense(1, use_bias=False)(h)
        a = jnp.swapaxes(a, -1, -2)                             # [B,1,N]
        attn = masked_softmax(a, None if mask is None else mask[:, None, :])
        pooled = jnp.einsum("bkn,bnd->bkd", attn, x)[:, 0]
        if return_attn:
            return pooled, [a[:, 0]]
        return pooled


class MHIM(nn.Module):
    """Student/teacher-shared MHIM network (`modules/mhim.py:36`)."""

    n_class: int
    mlp_dim: int = 512
    baseline: str = "selfattn"      # selfattn | attn
    act: str = "relu"
    da_act: str = "gelu"            # DAttention activation (`mhim.py:38`)
    droprate: float = 0.25
    mask_ratio: float = 0.0         # random
    mask_ratio_l: float = 0.0       # low-attention
    mask_ratio_h: float = 0.0       # high-attention
    mask_ratio_hr: float = 1.0      # random subset of high-attention
    attn_layer: int = 0
    msa_fusion: str = "vote"
    heads: int = 8
    pad_mode: str = "zero"          # 'wrap': reference-exact (SAttention)
    dtype: jnp.dtype = jnp.float32

    def _embed(self, feats, deterministic):
        # named after the reference's input projection so 'fc' student init
        # can copy exactly this subtree (`Step3_MHIM:358-375` patch_to_emb)
        h = XDense(self.mlp_dim, name="patch_to_emb")(feats)
        h = nn.gelu(h) if self.act == "gelu" else nn.relu(h)
        return nn.Dropout(self.droprate)(h, deterministic=deterministic)

    def _encoder(self):
        if self.baseline == "selfattn":
            return SAttentionEncoder(self.mlp_dim, self.heads,
                                     dtype=self.dtype,
                                     pad_mode=self.pad_mode)
        return DAttentionEncoder(self.mlp_dim, act=self.da_act)

    @nn.compact
    def __call__(self, feats, mask=None, deterministic: bool = True,
                 teacher_attn: Optional[jnp.ndarray] = None,
                 mask_ratio_h: Optional[jnp.ndarray] = None,
                 return_attn: bool = False):
        """Student forward: compose drop masks from teacher attention, then
        encode with the reduced mask (`modules/mhim.py:250-271`)."""
        b, n, _ = feats.shape
        if mask is None:
            mask = jnp.ones((b, n), bool)
        h = self._embed(feats, deterministic)

        keep = mask
        if not deterministic:
            r1, r2, r3 = jax.random.split(self.make_rng("stkim"), 3)
            drop = jnp.zeros_like(mask)
            if self.mask_ratio > 0:
                noise = jax.random.uniform(r1, (b, n))
                drop |= select_drop_mask(noise, mask, self.mask_ratio,
                                         largest=True)
            if teacher_attn is not None:

                def score(ta, frac, largest):
                    s = ta if largest else -ta
                    if ta.ndim == 3:  # [B,H,N]: vote fusion over heads
                        return fuse_heads_vote(s, mask, frac)
                    return s

                ta = teacher_attn
                if self.mask_ratio_l > 0:
                    drop |= select_drop_mask(
                        score(ta, self.mask_ratio_l, largest=False),
                        mask, self.mask_ratio_l, largest=True, rng=r2)
                mrh = self.mask_ratio_h if mask_ratio_h is None else mask_ratio_h
                if mask_ratio_h is not None or self.mask_ratio_h > 0:
                    drop |= select_drop_mask(
                        score(ta, mrh, largest=True),
                        mask, mrh, largest=True, rng=r3,
                        random_frac=self.mask_ratio_hr
                        if self.mask_ratio_hr > 0 else 1.0)
            keep = mask & ~drop

        enc = self._encoder()
        out = enc(h, keep, deterministic, return_attn=return_attn)
        if return_attn:
            cls_feat, attns = out
        else:
            cls_feat = out
        logits = XDense(self.n_class, name="predictor")(cls_feat)
        result = {"logits": logits, "cls_feat": cls_feat,
                  "keep": keep}
        if return_attn:
            result["attn"] = attns[self.attn_layer if self.attn_layer >= 0 else -1]
        return result

    def forward_teacher(self, feats, mask=None):
        """Teacher pass: no masking, returns cls feat + attention
        (`modules/mhim.py:190-202`)."""
        return self(feats, mask, deterministic=True, return_attn=True)


def soft_target_ce(student, teacher, temp_t=1.0, temp_s=1.0):
    """`SoftTargetCrossEntropy_v2` (`modules/mhim.py:20-33`)."""
    t = jax.nn.softmax(teacher / temp_t, axis=-1)
    ls = jax.nn.log_softmax(student / temp_s, axis=-1)
    return jnp.mean(jnp.sum(-t * ls, axis=-1))


def _mhim_script_tx(conf, sched):
    """The MHIM script's optimizer (`Step3_MHIM:380`): plain
    ``torch.optim.Adam(lr, weight_decay=wd)`` — COUPLED L2 decay added
    to the gradient before the Adam moments, NOT AdamW — and no gradient
    clipping (the script defines ``--grad_clipping`` but never applies
    it). Used by both the 'mhim' and 'pure' stages of the protocol."""
    import optax

    return optax.flatten(optax.chain(
        optax.add_decayed_weights(float(conf.wd)),
        optax.adam(sched)))


class MHIMFamily(Family):
    """Teacher-EMA training step (`Step3_MHIM:124-161`): teacher forward
    for attention + target feature, student forward with composed masks,
    loss = cls_alpha·CE + cl_alpha·softCE(student feat, teacher feat),
    then EMA(teacher ← student, mm). Teacher params ride in the aux state.
    """

    name = "mhim"

    def make_tx(self, conf, sched):
        return _mhim_script_tx(conf, sched)

    def make_train_step(self, model, conf):
        return jax.jit(self.make_step_body(model, conf))

    def make_step_body(self, model, conf):
        """Un-jitted (state, bag, rng) -> (state, aux) step — consumed
        directly by make_train_step and by the lax.scan epoch driver
        (engine/train.py::make_scan_train_step); the EMA teacher rides in
        the EMATrainState carry."""
        from acmil_tpu.engine.schedules import cosine_array

        cls_alpha = float(getattr(conf, "cls_alpha", 1.0))
        cl_alpha = float(getattr(conf, "cl_alpha", 0.1))
        # reference CLI defaults (`Step3_WSI_classification_MHIM.py:72`):
        # teacher temperature 0.1, student 1.0 — NOT the module defaults
        temp_t = float(getattr(conf, "temp_t", 0.1))
        temp_s = float(getattr(conf, "temp_s", 1.0))
        mm0 = float(getattr(conf, "mm", 0.9999))
        steps = int(getattr(conf, "steps_per_epoch", 1)) * conf.train_epoch

        # cosine schedules for EMA momentum and the high-attention mask
        # ratio (`Step3_MHIM:280-310`, `cosine_scheduler` utils.py:529),
        # baked as jnp constants indexed by state.step
        if bool(getattr(conf, "mm_sche", False)):
            mm_arr = jnp.asarray(cosine_array(
                mm0, float(getattr(conf, "mm_final", 1.0)),
                conf.train_epoch, max(steps // conf.train_epoch, 1)))
        else:
            mm_arr = None
        if bool(getattr(conf, "mrh_sche", False)):
            mrh_arr = jnp.asarray(cosine_array(
                float(getattr(conf, "mask_ratio_h", 0.0)), 0.0,
                conf.train_epoch, max(steps // conf.train_epoch, 1)))
        else:
            mrh_arr = None

        def step(state, bag, rng):
            mm = (mm_arr[jnp.minimum(state.step, len(mm_arr) - 1)]
                  if mm_arr is not None else mm0)
            mrh = (mrh_arr[jnp.minimum(state.step, len(mrh_arr) - 1)]
                   if mrh_arr is not None else None)
            valid = bag.mask.any(axis=1)
            s_rng, d_rng = jax.random.split(jax.random.fold_in(rng, state.step))
            rngs = {"stkim": s_rng, "dropout": d_rng}
            tea_params = state.teacher_params

            tea = model.apply({"params": tea_params}, bag.feats, bag.mask,
                              deterministic=True, return_attn=True)
            tea_attn = jax.lax.stop_gradient(tea["attn"])
            tea_feat = jax.lax.stop_gradient(tea["cls_feat"])

            def loss_fn(params):
                out = model.apply({"params": params}, bag.feats, bag.mask,
                                  deterministic=False,
                                  teacher_attn=tea_attn,
                                  mask_ratio_h=mrh, rngs=rngs)
                ce = L.cross_entropy(out["logits"], bag.label, valid)
                cl = (soft_target_ce(out["cls_feat"], tea_feat,
                                     temp_t, temp_s)
                      if cl_alpha > 0 else 0.0)
                return cls_alpha * ce + cl_alpha * cl, {
                    "logit_loss": ce, "cls_loss": cl}

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            new_state = state.apply_gradients(grads=grads)
            new_teacher = jax.tree_util.tree_map(
                lambda t, s: t * mm + s * (1.0 - mm),
                tea_params, new_state.params)
            new_state = new_state.replace(teacher_params=new_teacher)
            aux = dict(aux)
            aux["loss"] = loss
            return new_state, aux

        return step


class PureFamily(Family):
    """The MHIM script's '--model pure' stage (`Step3_MHIM:312-314`):
    default CE training semantics, but through the script's coupled-L2
    Adam optimizer rather than the generic script's AdamW."""

    name = "pure"

    def make_tx(self, conf, sched):
        return _mhim_script_tx(conf, sched)


register_family(MHIMFamily())
register_family(PureFamily())


def _mhim_shared_kwargs(conf):
    """Fields the reference exposes on BOTH mhim and pure
    (`Step3_WSI_classification_MHIM.py:50-68,313`): projection act /
    dropout, DAttention act, MSA heads / fusion / layer. Defaults mirror
    the reference CLI defaults (act=relu, da_act=relu — NOT the class
    defaults, which mirror `modules/mhim.py:36-38`)."""
    return dict(
        n_class=conf.n_class,
        mlp_dim=int(getattr(conf, "mlp_dim", 512)),
        baseline=str(getattr(conf, "baseline", "selfattn")),
        act=str(getattr(conf, "act", "relu")),
        da_act=str(getattr(conf, "da_act", "relu")),
        droprate=float(getattr(conf, "dropout", 0.25)),
        heads=int(getattr(conf, "n_heads", 8)),
        msa_fusion=str(getattr(conf, "msa_fusion", "vote")),
        attn_layer=int(getattr(conf, "attn_layer", 0)),
        # 'wrap' serves imported torch checkpoints with reference-exact
        # Nystrom/PPEG padding (see SAttentionEncoder.pad_mode)
        pad_mode=str(getattr(conf, "mhim_pad_mode", "zero")),
    )


@register_model("mhim", family="mhim")
def _mhim(conf):
    import jax.numpy as _jnp

    return MHIM(
        dtype=(_jnp.bfloat16 if str(getattr(conf, "compute_dtype", "float32"))
               == "bfloat16" else _jnp.float32),
        mask_ratio=float(getattr(conf, "mask_ratio", 0.0)),
        mask_ratio_l=float(getattr(conf, "mask_ratio_l", 0.0)),
        mask_ratio_h=float(getattr(conf, "mask_ratio_h", 0.0)),
        mask_ratio_hr=float(getattr(conf, "mask_ratio_hr", 1.0)),
        **_mhim_shared_kwargs(conf),
    )


@register_model("pure", family="pure")
def _pure(conf):
    """The MHIM 'pure' baseline: the same encoder without masking/teacher
    (`Step3_MHIM:135-137`, used to pre-train teacher checkpoints)."""
    return MHIM(**_mhim_shared_kwargs(conf))

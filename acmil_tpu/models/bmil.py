"""BMIL — probabilistic (Bayesian) MIL with variational-dropout layers.

Reference: `architecture/bmil.py`
(`probabilistic_MIL_Bayes_{vis,enc,spvis}:179,243,332`,
`GaussianSmoothing:110`, `get_ard_reg_vdo:446`) and
`architecture/linear_vdo.py:10` (ARD-prior variational dropout linear).

Variants:
- **vis / enc**: gated attention net emits per-patch (μ, logσ²); attention
  = sigmoid of a reparameterised Gaussian sample; bag feature is the
  A-weighted mean; classifier is a LinearVDO. `enc` additionally computes
  a KL against a class-dependent logistic-normal prior
  (`bmil.py:288-309`).
- **spvis**: per-patch (μ, logσ²) scattered onto the slide grid, μ
  Gaussian-smoothed (3x3, σ=0.5), KL vs class prior over the grid
  (`bmil.py:387-443`).

TPU-first reformulations:
- the spvis scatter grid is a **static** ``grid x grid`` canvas (config
  ``bmil_grid``); patch coords are scaled into it (the reference builds a
  dynamic ``H/patch x W/patch`` grid per slide, impossible under XLA
  static shapes);
- the data-KL reported is the grid **mean** (the reference keeps only
  ``kl_div.reshape(-1)[0]``, i.e. cell (0,0) — see `engine.py:82-84` — a
  latent bug we do not replicate);
- LinearVDO in eval returns the mean activation instead of sampling (the
  reference's deterministic path is commented out and it samples even in
  eval);
- model ARD KL (`get_ard_reg_vdo`) is computed inside the module by
  summing each LinearVDO's contribution (sown into the output dict)
  rather than by Python module traversal.
"""

from __future__ import annotations

import math
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
import numpy as np

from acmil_tpu.models import register_model
from acmil_tpu.ops.masked import masked_fill

_EPS = 1e-8


def vdo_kl(log_alp: jnp.ndarray) -> jnp.ndarray:
    """ARD KL approximation (`linear_vdo.py:87-103`): per-layer
    ``-sum(mean_axis1(elementwise))``."""
    k1, k2, k3 = 0.6134, 0.2026, 0.7126
    elt = -0.5 * jnp.log1p(jnp.exp(-log_alp)) + k1 * jnp.exp(-(k2 + k3 * log_alp) ** 2)
    return -elt.mean(axis=-1).sum()


class LinearVDO(nn.Module):
    """Variational-dropout dense layer (`linear_vdo.py:10-67`): training
    samples activations from N(xW, x² (α ⊙ W²)); eval returns the mean."""

    features: int
    ard_init: float = -8.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d_in = x.shape[-1]
        w = self.param("kernel", nn.initializers.normal(0.01),
                       (d_in, self.features))
        log_alp = self.param("log_alp",
                             nn.initializers.constant(self.ard_init),
                             (d_in, self.features))
        mu = x @ w
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            mu = mu + b
        self.sow("kl", "vdo", vdo_kl(log_alp),
                 init_fn=lambda: jnp.zeros(()), reduce_fn=lambda a, b: a + b)
        if deterministic:
            return mu
        # the reference adds eps INSIDE the matmul only
        # (`linear_vdo.py:42-48`), so var is exactly 0 for an all-zero
        # input row and sqrt'(0)=inf NaNs the backward. The reference
        # never pads so never sees zero rows; our padded bags do (zero
        # feats + zero-init biases) — the extra eps outside keeps the
        # sqrt gradient finite (0-cotangent padded rows then contribute
        # exactly 0) and shifts real activations by < 1e-8.
        var = (x * x) @ (jnp.exp(log_alp) * w * w + _EPS) + _EPS
        eps = jax.random.normal(self.make_rng("dropout"), mu.shape, mu.dtype)
        return mu + eps * jnp.sqrt(var)


class Conv2dVDO(nn.Module):
    """Variational-dropout conv layer (`linear_vdo.py:124-249`): the conv
    analogue of LinearVDO — mean conv plus a sampled variance term from
    α ⊙ W² applied to x². Bias-free (the reference notes bias → NaN)."""

    features: int
    kernel: int = 3
    ard_init: float = -1.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: [B, H, W, C]
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.normal(0.01),
                       (self.kernel, self.kernel, cin, self.features))
        log_alp = self.param("log_alp",
                             nn.initializers.constant(self.ard_init),
                             (self.kernel, self.kernel, cin, self.features))
        self.sow("kl", "vdo", vdo_kl(log_alp.reshape(-1, self.features)),
                 init_fn=lambda: jnp.zeros(()), reduce_fn=lambda a, b: a + b)
        pad = self.kernel // 2
        dn = ("NHWC", "HWIO", "NHWC")
        mu = jax.lax.conv_general_dilated(x, w, (1, 1), ((pad, pad), (pad, pad)),
                                          dimension_numbers=dn)
        if deterministic:
            return mu
        var = jax.lax.conv_general_dilated(
            x * x, jnp.exp(log_alp) * w * w + _EPS, (1, 1),
            ((pad, pad), (pad, pad)), dimension_numbers=dn) + _EPS
        # + _EPS outside: all-zero input windows (padded grid regions)
        # otherwise hit sqrt'(0)=inf in the backward — see LinearVDO
        eps = jax.random.normal(self.make_rng("dropout"), mu.shape, mu.dtype)
        return mu + eps * jnp.sqrt(var)


def gaussian_kernel2d(ksize: int = 3, sigma: float = 0.5) -> np.ndarray:
    ax = np.arange(ksize, dtype=np.float32) - (ksize - 1) / 2
    g = np.exp(-(ax / sigma) ** 2 / 2) / (sigma * math.sqrt(2 * math.pi))
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


def _kl_logistic_normal(mu_pr, mu_pos, logvar_pr, logvar_pos):
    """`bmil.py:364-365` (note the reference's own formula squares logvar)."""
    return (logvar_pr - logvar_pos) / 2.0 + (
        logvar_pos ** 2 + (mu_pr - mu_pos) ** 2) / (2.0 * logvar_pr ** 2) - 0.5


PRIOR_MU = (-5.0, 0.0)        # class-dependent prior (bmil.py:352-353)
PRIOR_LOGVAR = (-1.0, 3.0)


class BMILVis(nn.Module):
    """vis/enc variants (`bmil.py:179,243`): per-patch Gaussian attention.
    ``with_kl`` turns on the enc-style class-prior KL."""

    n_class: int
    d_feat: int
    d_hidden: int = 512
    d_attn: int = 256
    droprate: float = 0.25
    with_kl: bool = True

    @nn.compact
    def __call__(self, feats, mask=None, coords=None, label=None,
                 deterministic: bool = True):
        h = nn.relu(XDense(self.d_hidden)(feats))              # [B,N,H]
        if self.droprate:
            h = nn.Dropout(self.droprate)(h, deterministic=deterministic)
        av = jnp.tanh(XDense(self.d_attn)(h))
        au = nn.sigmoid(XDense(self.d_attn)(h))
        params2 = XDense(2)(av * au)                           # [B,N,2]
        mu, logvar = params2[..., 0], params2[..., 1]

        if deterministic:
            g = mu
        else:
            eps = jax.random.normal(self.make_rng("dropout"), mu.shape, mu.dtype)
            g = mu + eps * jnp.exp(0.5 * logvar)
        A = nn.sigmoid(g)                                        # [B,N]
        if mask is not None:
            A = A * mask.astype(A.dtype)
        M = jnp.einsum("bn,bnd->bd", A, h) / jnp.maximum(
            A.sum(axis=1, keepdims=True), _EPS)

        logits = LinearVDO(self.n_class, ard_init=-3.0)(M, deterministic)

        kl_data = jnp.zeros(())
        if self.with_kl and label is not None:
            mu_pr = jnp.asarray(PRIOR_MU)[label][:, None]
            logvar_pr = jnp.asarray(PRIOR_LOGVAR)[label][:, None]
            kl = _kl_logistic_normal(mu_pr, mu, logvar_pr, logvar)
            if mask is not None:
                kl = kl * mask.astype(kl.dtype)
                kl_data = kl.sum() / jnp.maximum(mask.sum(), 1)
            else:
                kl_data = kl.mean()

        kl_model = jnp.zeros(())  # filled by the family from the kl collection
        return {"logits": logits, "attn": A[:, None, :], "kl_data": kl_data,
                "kl_model": kl_model}


class BMILSpvis(nn.Module):
    """spvis variant (`bmil.py:332-443`): spatial Gaussian attention field."""

    n_class: int
    d_feat: int
    d_hidden: int = 512
    d_attn: int = 256
    grid: int = 64               # static canvas (TPU redesign, see module doc)
    droprate: float = 0.25

    @nn.compact
    def __call__(self, feats, mask=None, coords=None, label=None,
                 deterministic: bool = True):
        b, n, _ = feats.shape
        G = self.grid
        h = nn.relu(nn.Dropout(self.droprate)(
            XDense(self.d_hidden)(feats), deterministic=deterministic))

        ard = -4.0
        fa = nn.Dropout(self.droprate)(
            nn.sigmoid(LinearVDO(self.d_attn, ard)(h, deterministic)),
            deterministic=deterministic)
        fb = nn.Dropout(self.droprate)(
            jnp.tanh(LinearVDO(self.d_attn, ard)(h, deterministic)),
            deterministic=deterministic)
        params2 = LinearVDO(2, ard)(fa * fb, deterministic)      # [B,N,2]

        # scale coords into the static G x G canvas
        if coords is None:
            cell = jnp.zeros((b, n), jnp.int32)
        else:
            c = coords.astype(jnp.float32)
            cmax = jnp.max(jnp.where(mask[..., None], c, 0.0), axis=1,
                           keepdims=True) if mask is not None else c.max(1, keepdims=True)
            scaled = (c * (G - 1) / jnp.maximum(cmax, 1.0)).astype(jnp.int32)
            cell = scaled[..., 1] * G + scaled[..., 0]           # y * G + x
        if mask is not None:
            cell = jnp.where(mask, cell, G * G)                  # dropped

        def scatter(vals):
            canvas = jnp.zeros((b, G * G), vals.dtype)
            return jax.vmap(lambda cv, ix, vl: cv.at[ix].set(
                vl, mode="drop"))(canvas, cell, vals)

        mu = scatter(params2[..., 0]).reshape(b, G, G)
        logvar = scatter(params2[..., 1]).reshape(b, G, G)

        kl_data = jnp.zeros(())
        if label is not None:
            mu_pr = jnp.asarray(PRIOR_MU)[label][:, None, None]
            logvar_pr = jnp.asarray(PRIOR_LOGVAR)[label][:, None, None]
            kl_data = _kl_logistic_normal(mu_pr, mu, logvar_pr, logvar).mean()

        # gaussian-smooth mu (3x3, sigma 0.5), 'same' padding
        kern = jnp.asarray(gaussian_kernel2d(3, 0.5))[None, None]
        mu_s = jax.lax.conv_general_dilated(
            mu[:, None], kern, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]

        if deterministic:
            g = mu_s
        else:
            eps = jax.random.normal(self.make_rng("dropout"), mu_s.shape)
            g = mu_s + eps * jnp.exp(0.5 * logvar)
        A_grid = nn.sigmoid(g).reshape(b, G * G)

        safe_cell = jnp.clip(cell, 0, G * G - 1)
        patch_A = jnp.take_along_axis(A_grid, safe_cell, axis=1)  # [B,N]
        if mask is not None:
            patch_A = patch_A * mask.astype(patch_A.dtype)
        M = jnp.einsum("bn,bnd->bd", patch_A, h) / jnp.maximum(
            patch_A.sum(axis=1, keepdims=True), _EPS)

        logits = LinearVDO(self.n_class, ard_init=-3.0)(M, deterministic)
        return {"logits": logits, "attn": patch_A[:, None, :],
                "kl_data": kl_data, "kl_model": jnp.zeros(())}


@register_model("bmil_vis", family="bmil")
def _bmil_vis(conf):
    return BMILVis(n_class=conf.n_class, d_feat=conf.D_feat, with_kl=False)


@register_model("bmil_enc", family="bmil")
def _bmil_enc(conf):
    return BMILVis(n_class=conf.n_class, d_feat=conf.D_feat, with_kl=True)


@register_model("bmil_spvis", family="bmil")
def _bmil_spvis(conf):
    return BMILSpvis(n_class=conf.n_class, d_feat=conf.D_feat,
                     grid=int(getattr(conf, "bmil_grid", 64)))

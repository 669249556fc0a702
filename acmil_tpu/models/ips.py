"""IPS — Iterative Patch Selection: O(M)-memory streaming MIL.

Reference: `architecture/ips_net.py:13-244` — stream the bag in ``I``-sized
chunks, keep a running buffer of the top-``M`` patches by cross-attention
score, then run the MIL head on the selected M only. The reference version
is dead code (it imports a nonexistent `architecture.transformer.Transformer`,
SURVEY.md §2.2) — this rebuild is a working TPU formulation:

- the chunk loop is a ``lax.scan`` carrying ``(buf_feats [M, D],
  buf_scores [M], buf_mask [M])`` — constant memory regardless of N_pad;
- scores come from a gated-attention scorer (stop-gradient through the
  selection, like the reference's no-grad scoring pass at
  `ips_net.py:150-190`);
- the final head is gated-attention pooling over the M selected patches
  with their validity mask.

This is the long-context mechanism of choice for >100k-patch bags where
even Nystrom attention's landmark pass is HBM-bound.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from acmil_tpu.models import register_model
from acmil_tpu.models.common import AttentionGated, Classifier1fc, DimReduction
from acmil_tpu.ops.masked import NEG_INF, masked_fill, masked_softmax


class IPSNet(nn.Module):
    n_class: int
    d_inner: int = 128
    d_attn: int = 128
    m_keep: int = 256       # M: patches kept
    chunk: int = 256        # I: streaming chunk size

    @nn.compact
    def __call__(self, feats, mask=None, deterministic: bool = True,
                 return_attn: bool = False):
        b, n, d = feats.shape
        if mask is None:
            mask = jnp.ones((b, n), bool)
        x = DimReduction(self.d_inner)(feats)                    # [B,N,L]
        scorer = AttentionGated(self.d_attn, 1)
        score = jax.lax.stop_gradient(scorer(x)[:, 0])           # [B,N]
        score = masked_fill(score, mask)

        m = min(self.m_keep, n)
        c = self.chunk
        if n <= m:
            sel_x, sel_mask, sel_score = x, mask, score
        else:
            # stream chunks; scan carries the running top-m buffer
            n_chunks = -(-n // c)
            pad_n = n_chunks * c
            if pad_n > n:
                x_p = jnp.pad(x, ((0, 0), (0, pad_n - n), (0, 0)))
                mask_p = jnp.pad(mask, ((0, 0), (0, pad_n - n)))
                score_p = jnp.pad(score, ((0, 0), (0, pad_n - n)),
                                  constant_values=NEG_INF)
            else:
                x_p, mask_p, score_p = x, mask, score
            xs = (x_p.reshape(b, n_chunks, c, -1).swapaxes(0, 1),
                  mask_p.reshape(b, n_chunks, c).swapaxes(0, 1),
                  score_p.reshape(b, n_chunks, c).swapaxes(0, 1))

            def step(carry, chunk):
                bf, bm, bs = carry
                cf, cm, cs = chunk
                allf = jnp.concatenate([bf, cf], axis=1)         # [B, m+c, L]
                allm = jnp.concatenate([bm, cm], axis=1)
                alls = jnp.concatenate([bs, cs], axis=1)
                _, idx = jax.lax.top_k(alls, m)                  # [B, m]
                nf = jnp.take_along_axis(allf, idx[..., None], axis=1)
                nm = jnp.take_along_axis(allm, idx, axis=1)
                ns = jnp.take_along_axis(alls, idx, axis=1)
                return (nf, nm, ns), None

            init = (jnp.zeros((b, m, x.shape[-1]), x.dtype),
                    jnp.zeros((b, m), bool),
                    jnp.full((b, m), NEG_INF, score.dtype))
            (sel_x, sel_mask, sel_score), _ = jax.lax.scan(step, init, xs)

        # final head: gated attention pooling over the kept M
        a = AttentionGated(self.d_attn, 1)(sel_x)                # [B,1,M]
        attn = masked_softmax(a, sel_mask[:, None, :])
        pooled = jnp.einsum("bkm,bml->bkl", attn, sel_x)[:, 0]
        logits = Classifier1fc(self.n_class)(pooled, deterministic)
        if return_attn:
            return logits, a
        return logits


@register_model("ips")
def _ips(conf):
    return IPSNet(n_class=conf.n_class, d_inner=conf.D_inner,
                  m_keep=int(getattr(conf, "ips_m", 256)),
                  chunk=int(getattr(conf, "ips_chunk", 256)))

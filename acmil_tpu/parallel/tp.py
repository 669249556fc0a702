"""Tensor-parallel ViT encoder extraction (Megatron-style TP over a mesh).

The reference extracts features on one GPU per process
(`/root/reference/Step2_feature_extract.py:35-67`); its giant trunks
(GigaPath ViT-G/16, 1.13B params — `models.py:191-206` + the UNI/GigaPath
rows) simply need a big enough card. The TPU design instead makes the
model axis first-class: attention heads and the MLP hidden dimension are
sharded over a ``model`` mesh axis, so each chip holds ``1/tp`` of every
block's weights and the per-layer cross-chip traffic is exactly two
all-reduces of the [B, N, D] activations (after attn-proj and after fc2)
riding ICI — the standard Megatron decomposition, expressed as a
``shard_map`` because the fused extraction kernels cannot be partitioned
by pjit propagation (see build.py::_shard_batch for the same reasoning on
the data axis).

Sharding layout per :class:`~acmil_tpu.models.encoders.vit.ViT` block
(flax param naming, ``block{i}``):

- ``attn/qkv``  kernel [D, 3D] → column-shard by head: each device gets
  its ``H/tp`` heads of q, k and v ([D, 3·Hl·dh], packed (3, Hl, dh) so
  the unpacked split matches vit.py's ``jnp.split`` order);
- attention runs on local heads only — no communication (heads are
  embarrassingly parallel);
- ``attn/proj`` kernel [D, D] → row-shard by the same head slices
  ([Hl·dh, D]); partial products are ``psum``-ed, bias added once after;
- ``mlp/Dense_0`` kernel [D, Dh] → column-shard the hidden axis (for
  SwiGLU-packed trunks, GigaPath, BOTH halves of the packed [D, 2, h]
  layout are sliced on h so the local gate stays self-contained);
- ``mlp/Dense_1`` kernel [Dh, D] → row-shard the same hidden slices,
  ``psum``, bias once after;
- layernorms, layerscale, patch embed, cls/pos tokens, final norm and
  the CLIP output projection are replicated (activations between blocks
  are replicated, as in Megatron).

Numerics match the plain ``model.apply`` einsum path up to f32 reduction
reordering (tests/test_tp_encoder.py pins this on the virtual CPU mesh);
bf16 callers get the same tanh-approx gelu as the single-chip fast path
(encoders/fast.py::_mlp_half).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from acmil_tpu.models.encoders.vit import mlp_act
from acmil_tpu.ops.vit_layer import _ln_f32

# param-tree leaves (within a block) that carry a leading [tp, ...] shard
# axis after shard_vit_params_tp; everything else is replicated
_SHARDED = (
    ("attn", "qkv", "kernel"), ("attn", "qkv", "bias"),
    ("attn", "proj", "kernel"),
    ("mlp", "Dense_0", "kernel"), ("mlp", "Dense_0", "bias"),
    ("mlp", "Dense_1", "kernel"),
)


def make_tp_mesh(data: int = 1, model: Optional[int] = None,
                 devices: Optional[Sequence] = None) -> Mesh:
    """A ``(data, model)`` mesh; ``model`` innermost so the per-layer
    activation all-reduces ride the fastest ICI links while the data axis
    (no collectives during extraction) can span slower hops."""
    devs = list(devices if devices is not None else jax.devices())
    if model is None:
        model = len(devs) // data
    assert data * model <= len(devs), (data, model, len(devs))
    arr = np.asarray(devs[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def _slice_block(bp, heads: int, tp: int, act: str):
    """One block's params → (stacked tree, spec tree). Stacked leaves are
    [tp, ...local], replicated leaves pass through unchanged."""
    qkv_k = np.asarray(bp["attn"]["qkv"]["kernel"])
    d, three_d = qkv_k.shape
    dh = three_d // (3 * heads)
    assert heads % tp == 0, f"heads {heads} not divisible by tp {tp}"
    hl = heads // tp

    def head_cols(a):  # [.., 3D] packed (3, H, dh) → [tp, .., 3·Hl·dh]
        a = a.reshape(a.shape[:-1] + (3, tp, hl, dh))
        a = np.moveaxis(a, -3, 0)
        return a.reshape((tp,) + a.shape[1:-3] + (3 * hl * dh,))

    proj_k = np.asarray(bp["attn"]["proj"]["kernel"])
    proj_k = proj_k.reshape(tp, hl * dh, d)  # rows are (H, dh)-major

    w1 = np.asarray(bp["mlp"]["Dense_0"]["kernel"])
    b1 = np.asarray(bp["mlp"]["Dense_0"]["bias"])
    w2 = np.asarray(bp["mlp"]["Dense_1"]["kernel"])
    hidden = w2.shape[0]  # fc2's input width is the TRUE hidden size
    assert hidden % tp == 0, f"hidden {hidden} not divisible by tp {tp}"
    hlocal = hidden // tp

    def hid_cols(a):  # fc1 outputs: slice the hidden axis; SwiGLU-packed
        # trunks emit [.., 2, h] — slice h so silu(a)·b stays local
        packs = 2 if act == "swiglu" else 1
        a = a.reshape(a.shape[:-1] + (packs, tp, hlocal))
        a = np.moveaxis(a, -2, 0)
        return a.reshape((tp,) + a.shape[1:-2] + (packs * hlocal,))

    out = dict(bp)  # shallow copies; replicated leaves shared
    out["attn"] = {
        "qkv": {"kernel": head_cols(qkv_k), "bias": head_cols(
            np.asarray(bp["attn"]["qkv"]["bias"]))},
        "proj": {"kernel": proj_k,
                 "bias": np.asarray(bp["attn"]["proj"]["bias"])},
    }
    out["mlp"] = {
        "Dense_0": {"kernel": hid_cols(w1), "bias": hid_cols(b1)},
        "Dense_1": {"kernel": w2.reshape(tp, hlocal, d),
                    "bias": np.asarray(bp["mlp"]["Dense_1"]["bias"])},
    }
    return out


def shard_vit_params_tp(enc_params, *, heads: int, tp: int,
                        act: str = "gelu", mesh: Optional[Mesh] = None,
                        model_axis: str = "model"):
    """ViT param tree → (tp-stacked tree, PartitionSpec tree).

    Sharded leaves gain a leading ``tp`` axis (spec ``P(model_axis)``);
    replicated leaves keep their shape (spec ``P()``). With ``mesh``,
    leaves are ``device_put`` with the matching NamedSharding so each
    device materialises only its 1/tp slice of the big matrices.
    """
    stacked = {}
    for name, sub in enc_params.items():
        stacked[name] = (_slice_block(sub, heads, tp, act)
                         if name.startswith("block") else sub)

    def spec_of(path):
        keys = tuple(getattr(p, "key", getattr(p, "idx", None))
                     for p in path)
        if keys and str(keys[0]).startswith("block") and keys[1:] in _SHARDED:
            return P(model_axis)
        return P()

    specs = jax.tree_util.tree_map_with_path(
        lambda path, _: spec_of(path), stacked)
    if mesh is not None:
        stacked = jax.tree_util.tree_map(
            lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
            stacked, specs)
    return stacked, specs


def _tp_block(x, bp, heads_local: int, act: str, axis: str):
    """One transformer block on this device's head/hidden shard; two
    psums over ``axis``. Matches vit.py's ViTBlock einsum semantics with
    f32 layernorm statistics (the fast-path convention)."""
    f32 = jnp.float32
    dt = x.dtype
    xf = x.astype(f32)
    y = _ln_f32(xf, bp["norm1"]["scale"], bp["norm1"]["bias"]).astype(dt)

    wqkv = bp["attn"]["qkv"]["kernel"].astype(dt)
    qkv = y @ wqkv + bp["attn"]["qkv"]["bias"].astype(dt)
    b, n, _ = qkv.shape
    dh = wqkv.shape[-1] // (3 * heads_local)
    qkv = qkv.reshape(b, n, 3, heads_local, dh)
    q, k, v = (qkv[:, :, j].transpose(0, 2, 1, 3) for j in range(3))
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dh).astype(dt)
    attn = jax.nn.softmax(attn.astype(f32), axis=-1).astype(dt)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, heads_local * dh)

    part = (out @ bp["attn"]["proj"]["kernel"].astype(dt)).astype(f32)
    y2 = jax.lax.psum(part, axis) + bp["attn"]["proj"]["bias"].astype(f32)
    if "ls1" in bp:
        y2 = y2 * bp["ls1"].astype(f32)
    xf = xf + y2

    y = _ln_f32(xf, bp["norm2"]["scale"], bp["norm2"]["bias"]).astype(dt)
    h = y @ bp["mlp"]["Dense_0"]["kernel"].astype(dt)
    h = h + bp["mlp"]["Dense_0"]["bias"].astype(dt)
    h = mlp_act(h, act, approx_gelu=dt == jnp.bfloat16).astype(dt)
    part = (h @ bp["mlp"]["Dense_1"]["kernel"].astype(dt)).astype(f32)
    h2 = jax.lax.psum(part, axis) + bp["mlp"]["Dense_1"]["bias"].astype(f32)
    if "ls2" in bp:
        h2 = h2 * bp["ls2"].astype(f32)
    return (xf + h2).astype(dt)


def _tp_vit_local(params, images, *, patch: int, depth: int,
                  heads_local: int, act: str, pre_norm: bool, proj_dim,
                  dtype, axis: str):
    """Per-device forward (runs inside shard_map). ``images`` already
    normalised [b_local, S, S, 3]; sharded leaves arrive with a leading
    local axis of size 1 (squeezed at use sites via ``_local``)."""

    def _local(tree):  # drop the shard axis the in_spec left behind
        return jax.tree_util.tree_map(lambda a: a[0], tree)

    b = images.shape[0]
    x = jax.lax.conv_general_dilated(
        images.astype(dtype), params["patch_embed"]["kernel"].astype(dtype),
        window_strides=(patch, patch), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + params["patch_embed"]["bias"].astype(dtype)
    dim = x.shape[-1]
    x = x.reshape(b, -1, dim)
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (b, 1, dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(dtype)
    if pre_norm:
        x = _ln_f32(x.astype(jnp.float32), params["norm_pre"]["scale"],
                    params["norm_pre"]["bias"]).astype(dtype)

    for i in range(depth):
        bp = dict(params[f"block{i}"])
        bp["attn"] = {"qkv": _local(bp["attn"]["qkv"]),
                      "proj": {"kernel": bp["attn"]["proj"]["kernel"][0],
                               "bias": bp["attn"]["proj"]["bias"]}}
        bp["mlp"] = {"Dense_0": _local(bp["mlp"]["Dense_0"]),
                     "Dense_1": {"kernel": bp["mlp"]["Dense_1"]["kernel"][0],
                                 "bias": bp["mlp"]["Dense_1"]["bias"]}}
        x = _tp_block(x, bp, heads_local, act, axis)

    xn = _ln_f32(x.astype(jnp.float32), params["norm"]["scale"],
                 params["norm"]["bias"])
    feat = xn[:, 0].astype(dtype)
    if proj_dim:
        feat = feat @ params["proj_out"]["kernel"].astype(dtype)
    return feat


def make_tp_vit_forward(mesh: Mesh, specs, *, patch: int, depth: int,
                        heads: int, act: str = "gelu",
                        pre_norm: bool = False, proj_dim=None,
                        dtype=jnp.bfloat16, data_axis: str = "data",
                        model_axis: str = "model", pre=None):
    """jit(shard_map) forward: (stacked_params, images[B,S,S,3]) → feats.

    Images are sharded on ``data_axis`` (pad the batch to a multiple of
    its size — :func:`tp_encoder_feature_fn` does), params per ``specs``.
    Output is replicated over ``model_axis`` (the final psum makes every
    model-shard's activations identical), gathered on ``data_axis``.
    ``pre``: optional per-shard image preprocessing (elementwise —
    normalisation), applied inside the sharded program so the uint8→f32
    expansion never materialises host-side.
    """
    from jax import shard_map

    tp = mesh.shape[model_axis]
    assert heads % tp == 0, (heads, tp)

    def run(params, images):
        if pre is not None:
            images = pre(images)
        return _tp_vit_local(params, images, patch=patch, depth=depth,
                             heads_local=heads // tp, act=act,
                             pre_norm=pre_norm, proj_dim=proj_dim,
                             dtype=dtype, axis=model_axis)

    return jax.jit(shard_map(
        run, mesh=mesh, in_specs=(specs, P(data_axis)),
        out_specs=P(data_axis), check_vma=False))


def tp_encoder_feature_fn(model, variables, spec, mesh: Mesh,
                          out_dtype=jnp.float16):
    """Tensor-parallel drop-in for
    :func:`~acmil_tpu.models.encoders.build.encoder_feature_fn`:
    uint8 image batch → fp16 features, the trunk sharded ``1/tp`` per
    device over the mesh's ``model`` axis (× data parallelism over
    ``data``). ViT trunks only — the ResNet encoders are small enough
    that the data-parallel path always wins."""
    from acmil_tpu.models.encoders.build import preprocess
    from acmil_tpu.models.encoders.vit import ViT

    enc = model.encoder
    if not isinstance(enc, ViT):
        raise ValueError(
            f"tensor parallelism supports ViT trunks only, got "
            f"{type(enc).__name__}; use the data-parallel path (--mesh_data)")
    tp = mesh.shape["model"]
    stacked, specs = shard_vit_params_tp(
        variables["params"]["encoder"], heads=enc.heads, tp=tp,
        act=enc.act, mesh=mesh)
    run = make_tp_vit_forward(
        mesh, specs, patch=enc.patch, depth=enc.depth, heads=enc.heads,
        act=enc.act, pre_norm=enc.pre_norm, proj_dim=enc.proj_dim,
        dtype=enc.dtype, pre=lambda u8: preprocess(u8, spec, enc.dtype))
    n_data = mesh.shape["data"]

    def feat_fn(images_u8):
        images_u8 = jnp.asarray(images_u8)
        b = images_u8.shape[0]
        b_full = (b + n_data - 1) // n_data * n_data
        if b_full != b:
            images_u8 = jnp.concatenate(
                [images_u8, jnp.zeros((b_full - b,) + images_u8.shape[1:],
                                      images_u8.dtype)])
        return run(stacked, images_u8)[:b].astype(out_dtype)

    return feat_fn

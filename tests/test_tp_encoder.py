"""Tensor-parallel ViT extraction (parallel/tp.py) on the virtual CPU
mesh: the Megatron head/hidden sharding must reproduce single-device
numerics for every trunk family the reference ships (plain gelu ViT-S/B,
SwiGLU+layerscale DINOv2 GigaPath/UNI, pre-norm+projection CLIP —
`/root/reference/models.py:191-206`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acmil_tpu.models.encoders.vit import ViT
from acmil_tpu.parallel.tp import (make_tp_mesh, make_tp_vit_forward,
                                   shard_vit_params_tp, tp_encoder_feature_fn)

VARIANTS = {
    # name: (builder, act) — tiny geometries, heads divisible by 8
    "plain": lambda: ViT(4, 32, 2, 8, img_size=16, dtype=jnp.float32),
    "swiglu_ls": lambda: ViT(4, 48, 2, 8, img_size=16, mlp_ratio=16.0 / 3.0,
                             act="swiglu", layerscale=True, ls_init=0.5,
                             dtype=jnp.float32),
    "clip": lambda: ViT(4, 32, 2, 8, img_size=16, proj_dim=24,
                        pre_norm=True, act="quick_gelu", dtype=jnp.float32),
}


def _ref_and_tp(name, data=1, model=8, batch=4):
    enc = VARIANTS[name]()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (batch, enc.img_size, enc.img_size, 3), jnp.float32)
    params = enc.init(rng, x[:1])["params"]
    ref = enc.apply({"params": params}, x)

    mesh = make_tp_mesh(data=data, model=model)
    stacked, specs = shard_vit_params_tp(
        params, heads=enc.heads, tp=model, act=enc.act, mesh=mesh)
    fwd = make_tp_vit_forward(
        mesh, specs, patch=enc.patch, depth=enc.depth, heads=enc.heads,
        act=enc.act, pre_norm=enc.pre_norm, proj_dim=enc.proj_dim,
        dtype=jnp.float32)
    return ref, fwd(stacked, x), stacked, enc


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_tp8_matches_single_device(name):
    ref, tp, stacked, enc = _ref_and_tp(name, data=1, model=8)
    np.testing.assert_allclose(np.asarray(tp), np.asarray(ref),
                               rtol=2e-4, atol=1e-5)
    # each device holds 1/tp of every big matrix (the point of TP)
    qkv = stacked["block0"]["attn"]["qkv"]["kernel"]
    assert qkv.shape == (8, enc.dim, 3 * enc.dim // 8)
    w2 = stacked["block0"]["mlp"]["Dense_1"]["kernel"]
    hidden = w2.shape[0] * w2.shape[1]  # true hidden (post-gate for swiglu)
    assert w2.shape == (8, hidden // 8, enc.dim)


@pytest.mark.parametrize("name", ["plain", "swiglu_ls"])
def test_dp4_tp2_matches_single_device(name):
    ref, tp, _, _ = _ref_and_tp(name, data=4, model=2, batch=8)
    np.testing.assert_allclose(np.asarray(tp), np.asarray(ref),
                               rtol=2e-4, atol=1e-5)


def test_tp_feature_fn_matches_dp_path():
    """End-to-end uint8 → fp16 features: the TP feature fn agrees with
    encoder_feature_fn's single-device model.apply route, including batch
    padding to the data-axis multiple (b=5 on a (2,4) mesh)."""
    from acmil_tpu.models.encoders.build import (CustomModel, EncoderSpec,
                                                 encoder_feature_fn)

    enc = VARIANTS["plain"]()
    model = CustomModel(encoder=enc, n_class=2)
    rng = jax.random.PRNGKey(0)
    u8 = np.random.RandomState(0).randint(
        0, 255, (5, 16, 16, 3)).astype(np.uint8)
    variables = {"params": model.init(
        rng, jnp.zeros((1, 16, 16, 3), jnp.float32))["params"]}
    spec = EncoderSpec(lambda dt: enc, enc.dim, 16,
                       (0.5, 0.5, 0.5), (0.5, 0.5, 0.5), "vit", depth=2)

    ref_fn = encoder_feature_fn(model, variables, spec, fast=False,
                                out_dtype=jnp.float16)
    mesh = make_tp_mesh(data=2, model=4)
    tp_fn = tp_encoder_feature_fn(model, variables, spec, mesh,
                                  out_dtype=jnp.float16)
    ref, tp = np.asarray(ref_fn(u8)), np.asarray(tp_fn(u8))
    assert tp.shape == ref.shape == (5, enc.dim)
    np.testing.assert_allclose(tp.astype(np.float32),
                               ref.astype(np.float32), rtol=2e-2, atol=2e-3)


def test_tp_rejects_indivisible_heads():
    enc = ViT(4, 36, 1, 6, img_size=16, dtype=jnp.float32)  # 6 heads
    params = enc.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 16, 16, 3)))["params"]
    with pytest.raises(AssertionError, match="divisible"):
        shard_vit_params_tp(params, heads=6, tp=4)


def test_tp_rejects_resnet():
    from acmil_tpu.models.encoders.build import CustomModel, EncoderSpec
    from acmil_tpu.models.encoders.resnet import resnet18

    enc = resnet18(jnp.float32)
    model = CustomModel(encoder=enc, n_class=2)
    spec = EncoderSpec(lambda dt: enc, 512, 16,
                       (0.5, 0.5, 0.5), (0.5, 0.5, 0.5), "resnet")
    mesh = make_tp_mesh(data=1, model=8)
    with pytest.raises(ValueError, match="ViT trunks only"):
        tp_encoder_feature_fn(model, {"params": {}}, spec, mesh)

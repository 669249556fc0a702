"""Encoder tests: forward shapes and torch→flax conversion parity."""

import numpy as np
import pytest

from acmil_tpu.models.encoders.resnet import resnet18
from acmil_tpu.models.encoders.vit import ViT

pytestmark = pytest.mark.slow  # heavy lane: deselect with -m "not slow"


def test_vit_forward_shape(rng):
    import jax.numpy as jnp

    m = ViT(patch=16, dim=64, depth=2, heads=4, img_size=32)
    x = jnp.ones((2, 32, 32, 3))
    params = m.init(rng, x)
    out = m.apply(params, x)
    assert out.shape == (2, 64)


def test_vit_clip_projection(rng):
    import jax.numpy as jnp

    m = ViT(patch=16, dim=64, depth=1, heads=4, img_size=32, proj_dim=48,
            pre_norm=True)
    x = jnp.ones((1, 32, 32, 3))
    params = m.init(rng, x)
    out = m.apply(params, x)
    assert out.shape == (1, 48)
    assert m.embed_dim == 48


def test_resnet18_forward_shape(rng):
    import jax.numpy as jnp

    m = resnet18()
    x = jnp.ones((1, 64, 64, 3))
    variables = m.init(rng, x)
    out = m.apply(variables, x)
    assert out.shape == (1, 512)


class _TorchTinyViT:
    """timm-layout torch ViT for converter parity testing."""

    def build(self, dim=32, depth=2, heads=2, patch=8, img=16):
        import torch
        import torch.nn as nn

        class Block(nn.Module):
            def __init__(self):
                super().__init__()
                self.norm1 = nn.LayerNorm(dim, eps=1e-6)
                self.norm2 = nn.LayerNorm(dim, eps=1e-6)
                self.attn = nn.Module()
                self.attn.qkv = nn.Linear(dim, dim * 3)
                self.attn.proj = nn.Linear(dim, dim)
                self.mlp = nn.Module()
                self.mlp.fc1 = nn.Linear(dim, dim * 4)
                self.mlp.fc2 = nn.Linear(dim * 4, dim)
                self.heads = heads

            def forward(self, x):
                import math

                b, n, d = x.shape
                h = self.heads
                y = self.norm1(x)
                qkv = self.attn.qkv(y).reshape(b, n, 3, h, d // h)
                q, k, v = qkv.permute(2, 0, 3, 1, 4)
                a = (q @ k.transpose(-1, -2)) / math.sqrt(d // h)
                a = a.softmax(-1)
                y = (a @ v).transpose(1, 2).reshape(b, n, d)
                x = x + self.attn.proj(y)
                y = self.norm2(x)
                y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y)))
                return x + y

        class TinyViT(nn.Module):
            def __init__(self):
                super().__init__()
                self.patch_embed = nn.Module()
                self.patch_embed.proj = nn.Conv2d(3, dim, patch, patch)
                n_tok = (img // patch) ** 2 + 1
                self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
                self.pos_embed = nn.Parameter(torch.randn(1, n_tok, dim) * 0.02)
                self.blocks = nn.ModuleList([Block() for _ in range(depth)])
                self.norm = nn.LayerNorm(dim, eps=1e-6)

            def forward(self, x):
                b = x.shape[0]
                x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
                cls = self.cls_token.expand(b, -1, -1)
                x = torch.cat([cls, x], 1) + self.pos_embed
                for blk in self.blocks:
                    x = blk(x)
                return self.norm(x)[:, 0]

        return TinyViT()


def test_vit_converter_parity():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from acmil_tpu.models.encoders.convert import convert_vit

    dim, depth, heads, patch, img = 32, 2, 2, 8, 16
    tm = _TorchTinyViT().build(dim, depth, heads, patch, img)
    tm.eval()

    # state dict uses timm names thanks to the module structure above
    sd = tm.state_dict()
    # blocks.N.* naming check
    assert any(k.startswith("blocks.0.attn.qkv") for k in sd)

    params = convert_vit(sd, depth=depth)
    fm = ViT(patch=patch, dim=dim, depth=depth, heads=heads, img_size=img)

    rs = np.random.RandomState(0)
    x = rs.randn(2, img, img, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    f_out = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(f_out, t_out, rtol=2e-4, atol=2e-4)


def test_resnet_converter_shapes():
    """Converter emits the exact flax tree (zero-filled torch tensors)."""
    torch = pytest.importorskip("torch")
    import jax

    from acmil_tpu.models.encoders.convert import convert_resnet

    # synthesise a torchvision-style resnet18 state dict with right shapes
    sd = {}

    def conv(name, cin, cout, k):
        sd[f"{name}.weight"] = torch.zeros(cout, cin, k, k)

    def bn(name, c):
        for suf, v in (("weight", torch.ones(c)), ("bias", torch.zeros(c)),
                       ("running_mean", torch.zeros(c)),
                       ("running_var", torch.ones(c))):
            sd[f"{name}.{suf}"] = v

    conv("conv1", 3, 64, 7)
    bn("bn1", 64)
    chans = [64, 128, 256, 512]
    cin = 64
    for li, c in enumerate(chans):
        for bi in range(2):
            t = f"layer{li + 1}.{bi}"
            conv(f"{t}.conv1", cin if bi == 0 else c, c, 3)
            bn(f"{t}.bn1", c)
            conv(f"{t}.conv2", c, c, 3)
            bn(f"{t}.bn2", c)
            if bi == 0 and cin != c:
                conv(f"{t}.downsample.0", cin, c, 1)
                bn(f"{t}.downsample.1", c)
        cin = c

    params, stats = convert_resnet(sd)
    m = resnet18()
    import jax.numpy as jnp

    ref = m.init(jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3)))
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref["params"])
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.ones((1, 64, 64, 3)))
    assert out.shape == (1, 512)


def test_clip_converter_shapes():
    """open_clip visual state dict (zero-filled, right shapes) converts to
    the exact flax tree and forwards."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from acmil_tpu.models.encoders.convert import convert_clip_vit

    dim, depth, heads, patch, img, proj = 32, 2, 2, 8, 16, 24
    n_tok = (img // patch) ** 2 + 1
    sd = {
        "visual.conv1.weight": torch.zeros(dim, 3, patch, patch),
        "visual.class_embedding": torch.zeros(dim),
        "visual.positional_embedding": torch.zeros(n_tok, dim),
        "visual.ln_pre.weight": torch.ones(dim),
        "visual.ln_pre.bias": torch.zeros(dim),
        "visual.ln_post.weight": torch.ones(dim),
        "visual.ln_post.bias": torch.zeros(dim),
        "visual.proj": torch.zeros(dim, proj),
    }
    for i in range(depth):
        b = f"visual.transformer.resblocks.{i}"
        sd.update({
            f"{b}.ln_1.weight": torch.ones(dim), f"{b}.ln_1.bias": torch.zeros(dim),
            f"{b}.ln_2.weight": torch.ones(dim), f"{b}.ln_2.bias": torch.zeros(dim),
            f"{b}.attn.in_proj_weight": torch.zeros(3 * dim, dim),
            f"{b}.attn.in_proj_bias": torch.zeros(3 * dim),
            f"{b}.attn.out_proj.weight": torch.zeros(dim, dim),
            f"{b}.attn.out_proj.bias": torch.zeros(dim),
            f"{b}.mlp.c_fc.weight": torch.zeros(4 * dim, dim),
            f"{b}.mlp.c_fc.bias": torch.zeros(4 * dim),
            f"{b}.mlp.c_proj.weight": torch.zeros(dim, 4 * dim),
            f"{b}.mlp.c_proj.bias": torch.zeros(dim),
        })
    params = convert_clip_vit(sd, depth=depth)
    m = ViT(patch=patch, dim=dim, depth=depth, heads=heads, img_size=img,
            proj_dim=proj, pre_norm=True, act="quick_gelu")
    ref = m.init(jax.random.PRNGKey(0), jnp.ones((1, img, img, 3)))
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref["params"])
    got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    assert ref_shapes == got_shapes
    out = m.apply({"params": params}, jnp.ones((1, img, img, 3)))
    assert out.shape == (1, proj)


class _TorchTinyDinoV2:
    """timm-layout torch ViT with layerscale + SwiGLU-packed MLP — the
    UNI (ls only) / GigaPath (ls + swiglu) block structure."""

    def build(self, dim=32, depth=2, heads=2, patch=8, img=16, swiglu=True,
              mlp_ratio=4.0):
        import math

        import torch
        import torch.nn as nn

        hidden = int(dim * mlp_ratio)

        class LS(nn.Module):
            def __init__(self):
                super().__init__()
                self.gamma = nn.Parameter(torch.full((dim,), 1e-5))

            def forward(self, x):
                return x * self.gamma

        class Block(nn.Module):
            def __init__(self):
                super().__init__()
                self.norm1 = nn.LayerNorm(dim, eps=1e-6)
                self.norm2 = nn.LayerNorm(dim, eps=1e-6)
                self.attn = nn.Module()
                self.attn.qkv = nn.Linear(dim, dim * 3)
                self.attn.proj = nn.Linear(dim, dim)
                self.ls1, self.ls2 = LS(), LS()
                self.mlp = nn.Module()
                self.mlp.fc1 = nn.Linear(dim, hidden)
                self.mlp.fc2 = nn.Linear(hidden // 2 if swiglu else hidden, dim)
                self.heads = heads

            def forward(self, x):
                b, n, d = x.shape
                h = self.heads
                y = self.norm1(x)
                qkv = self.attn.qkv(y).reshape(b, n, 3, h, d // h)
                q, k, v = qkv.permute(2, 0, 3, 1, 4)
                a = ((q @ k.transpose(-1, -2)) / math.sqrt(d // h)).softmax(-1)
                y = (a @ v).transpose(1, 2).reshape(b, n, d)
                x = x + self.ls1(self.attn.proj(y))
                y = self.mlp.fc1(self.norm2(x))
                if swiglu:  # timm SwiGLUPacked: silu(first half) * second
                    a_, b_ = y.chunk(2, dim=-1)
                    y = torch.nn.functional.silu(a_) * b_
                else:
                    y = torch.nn.functional.gelu(y)
                return x + self.ls2(self.mlp.fc2(y))

        class Tiny(nn.Module):
            def __init__(self):
                super().__init__()
                self.patch_embed = nn.Module()
                self.patch_embed.proj = nn.Conv2d(3, dim, patch, patch)
                n_tok = (img // patch) ** 2 + 1
                self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
                self.pos_embed = nn.Parameter(torch.randn(1, n_tok, dim) * 0.02)
                self.blocks = nn.ModuleList([Block() for _ in range(depth)])
                self.norm = nn.LayerNorm(dim, eps=1e-6)
                # make the tiny random layerscales non-degenerate
                for blk in self.blocks:
                    with torch.no_grad():
                        blk.ls1.gamma.uniform_(0.5, 1.5)
                        blk.ls2.gamma.uniform_(0.5, 1.5)

            def forward(self, x):
                b = x.shape[0]
                x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
                x = torch.cat([self.cls_token.expand(b, -1, -1), x], 1)
                x = x + self.pos_embed
                for blk in self.blocks:
                    x = blk(x)
                return self.norm(x)[:, 0]

        return Tiny()


@pytest.mark.parametrize("swiglu,mlp_ratio", [(False, 4.0), (True, 16 / 3)])
def test_dinov2_converter_parity(swiglu, mlp_ratio):
    """UNI (layerscale) / GigaPath (layerscale+SwiGLU) block conversion."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from acmil_tpu.models.encoders.convert import convert_vit

    dim, depth, heads, patch, img = 48, 2, 2, 8, 16
    tm = _TorchTinyDinoV2().build(dim, depth, heads, patch, img,
                                  swiglu=swiglu, mlp_ratio=mlp_ratio)
    tm.eval()
    sd = tm.state_dict()
    assert "blocks.0.ls1.gamma" in sd
    params = convert_vit(sd, depth=depth)
    fm = ViT(patch=patch, dim=dim, depth=depth, heads=heads, img_size=img,
             mlp_ratio=mlp_ratio, act="swiglu" if swiglu else "gelu",
             layerscale=True)

    rs = np.random.RandomState(0)
    x = rs.randn(2, img, img, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    f_out = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(f_out, t_out, rtol=2e-4, atol=2e-4)


# every (pretrain, backbone) pair the reference can build
# (`models.py:191-214`) plus each D_feat family row
# (`Step3_WSI_classification_ACMIL.py:69-87`)
REFERENCE_ENCODER_KEYS = [
    ("natural_supervised", "ViT-B/16", 768),
    ("natural_ssl", "ViT-S/16", 768),     # ref maps this to dino_vitb16
    ("natural_supervised", "Resnet50", 2048),
    ("natural_supervised", "Resnet18", 512),
    ("natural_ssl", "Resnet50", 2048),    # DINO ResNet50
    ("medical_ssl", "Resnet50", 2048),    # Lunit BT RN50
    ("medical_ssl", "ViT-S/16", 384),     # Lunit DINO_p16
    ("medical_ssl", "ViT-S/8", 384),      # Lunit DINO_p8
    ("tailored_sl", "ViT-S/16", 384),     # pretrain-only dispatch
    ("tailored_sl", "anything", 384),     # backbone ignored (models.py:213)
    ("UNI", "ViT-L/16", 1024),
    ("UNI", "", 1024),                    # pretrain-only dispatch
    ("GigaPath", "ViT-G/16", 1536),
    ("GigaPath", "", 1536),
    ("path-clip-L-336", "ViT-L/336", 768),
    ("openai-clip-L-336", "ViT-L/336", 768),
]


@pytest.mark.parametrize("pretrain,backbone,want_dim", REFERENCE_ENCODER_KEYS)
def test_every_reference_encoder_builds_and_extracts(pretrain, backbone, want_dim):
    import jax
    import jax.numpy as jnp

    from acmil_tpu.config import PRETRAIN_DIMS
    from acmil_tpu.models.encoders.build import build_encoder, preprocess

    class C:
        pass

    conf = C()
    conf.pretrain, conf.backbone, conf.n_class = pretrain, backbone, 2
    conf.pretrain_weights = ""
    model, spec, variables = build_encoder(conf, dtype=jnp.float32)
    assert spec.embed_dim == want_dim
    # the MIL-side D_feat table must agree for single-trunk families
    if pretrain in ("UNI", "GigaPath"):
        assert PRETRAIN_DIMS[pretrain][0] == want_dim

    # init is the expensive part for the giant trunks: shrink via jax.eval_shape
    img = np.zeros((1, spec.img_size, spec.img_size, 3), np.uint8)
    x = preprocess(jnp.asarray(img), spec, dtype=jnp.float32)

    def init_and_fwd(x):
        v = model.init(jax.random.PRNGKey(0), x)
        return model.apply(v, x)

    out = jax.eval_shape(init_and_fwd, x)
    logits, feat = out
    assert feat.shape == (1, spec.embed_dim)
    assert logits.shape == (1, 2)


def test_encoder_feature_fn_mesh_matches_single():
    """Data-sharded extraction (shard_map over the batch axis — the fused
    path is a pallas_call that pjit cannot partition) must equal the
    single-device path, including a ragged batch that needs padding."""
    import jax
    import numpy as np

    from acmil_tpu.config import Config
    from acmil_tpu.models.encoders.build import build_encoder, encoder_feature_fn
    from acmil_tpu.parallel import make_mesh

    conf = Config(pretrain="medical_ssl", backbone="ViT-S/16", n_class=2)
    model, spec, _ = build_encoder(conf)
    import jax.numpy as jnp
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 224, 224, 3), jnp.bfloat16))
    rs = np.random.RandomState(0)
    imgs = rs.randint(0, 256, size=(6, 224, 224, 3)).astype(np.uint8)

    mesh = make_mesh(data=4, seq=1)
    f_single = np.asarray(
        encoder_feature_fn(model, variables, spec)(imgs), np.float32)
    f_mesh = np.asarray(
        encoder_feature_fn(model, variables, spec, mesh=mesh)(imgs),
        np.float32)
    assert f_mesh.shape == f_single.shape
    np.testing.assert_allclose(f_mesh, f_single, rtol=2e-2, atol=2e-2)

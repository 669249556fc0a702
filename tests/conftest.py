"""Test env: force CPU backend with 8 virtual devices BEFORE jax import,
so multi-device sharding tests run anywhere (SURVEY.md §4 test strategy)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The image's sitecustomize registers the axon TPU plugin and flips
# jax_platforms to "axon,cpu" at interpreter start (before conftest). Undo it
# here — backends aren't initialised until first use, so this still wins.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(0)


def make_synthetic_bags(n_slides=20, d=32, n_class=2, seed=0,
                        min_len=40, max_len=300):
    """Separable synthetic bags: positive slides carry a handful of
    'tumor' patches drawn from a shifted Gaussian — the MIL analogue of a
    golden-value fixture (no real WSI data in CI)."""
    rs = np.random.RandomState(seed)
    slides = {}
    for i in range(n_slides):
        n = rs.randint(min_len, max_len)
        label = i % n_class
        feats = rs.randn(n, d).astype(np.float32)
        if label > 0:
            # Signal must clear the max-order-statistic of a few hundred
            # Gaussian patches (~3σ), or MIL heads just memorise.
            k = max(3, n // 15)
            idx = rs.choice(n, k, replace=False)
            feats[idx] += 6.0 * label * np.ones(d) / np.sqrt(d)
        coords = rs.randint(0, 50000, size=(n, 2))
        name = f"{'test_' if i >= int(n_slides * 0.7) else ''}slide_{i:03d}"
        slides[name] = {"feat": feats, "coords": coords, "label": label}
    return slides


@pytest.fixture
def synthetic_slides():
    return make_synthetic_bags()


@pytest.fixture
def tiny_conf():
    from acmil_tpu.config import Config

    return Config(
        n_class=2, D_feat=32, D_inner=16, n_token=3, n_masked_patch=5,
        mask_drop=0.5, lr=1e-3, train_epoch=3, min_bucket=64, seed=0,
    )

"""The padded, length-bucketed FeatureBag — the central TPU data abstraction.

The reference trains on variable-length bags with batch size 1
(`/root/reference/config/*.yml: B: 1`; bags are `[1, N, D]` tensors,
`architecture/transformer.py:305`). XLA compiles one program per shape, so a
TPU-native design buckets bag lengths to a small set of pad sizes and carries
an explicit validity mask. The only place the reference acknowledges padding
is the lct path (`datasets/datasets.py:121-126`, fixed ``n_patch`` padding);
this module generalises it.

Every MIL head in :mod:`acmil_tpu.models` consumes ``Bag`` and respects
``mask`` (masked softmax, masked top-k, masked landmark means).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Bag:
    """A batch of padded patch-feature bags.

    Attributes:
      feats:  ``[B, N_pad, D]`` patch features (f32/bf16 on device).
      mask:   ``[B, N_pad]`` bool — True for real patches.
      coords: ``[B, N_pad, 2]`` int32 slide-space patch coordinates.
      label:  ``[B]`` int32 slide labels.
    """

    feats: jnp.ndarray
    mask: jnp.ndarray
    coords: jnp.ndarray
    label: jnp.ndarray

    @property
    def batch(self) -> int:
        return self.feats.shape[0]

    @property
    def n_pad(self) -> int:
        return self.feats.shape[1]

    @property
    def dim(self) -> int:
        return self.feats.shape[2]

    def lengths(self) -> jnp.ndarray:
        return self.mask.sum(axis=1)


def bucket_length(n: int, min_bucket: int = 256, max_patches: int = 65536) -> int:
    """Round ``n`` up to the next power-of-two bucket (clamped).

    Power-of-two buckets keep the number of distinct compiled programs at
    ~log2(max/min) while wasting <2x pad in the worst case; bucket sizes are
    multiples of 128 so padded N maps cleanly onto TPU lanes.
    """
    n = max(1, min(n, max_patches))
    b = min_bucket
    while b < n:
        b *= 2
    return min(b, max_patches)


def pad_bag(
    feats: np.ndarray,
    coords: np.ndarray | None = None,
    label: int = 0,
    n_pad: int | None = None,
    min_bucket: int = 256,
    max_patches: int = 65536,
    dtype=np.float32,
) -> Bag:
    """Pad a single ``[N, D]`` bag to a bucketed ``[1, N_pad, D]`` Bag."""
    feats = np.asarray(feats)
    n, d = feats.shape
    if n > max_patches:
        # Keep a uniform subsample rather than truncating a spatial prefix.
        idx = np.linspace(0, n - 1, max_patches).astype(np.int64)
        feats = feats[idx]
        coords = coords[idx] if coords is not None else None
        n = max_patches
    if n_pad is None:
        n_pad = bucket_length(n, min_bucket, max_patches)
    out = np.zeros((1, n_pad, d), dtype=dtype)
    out[0, :n] = feats
    mask = np.zeros((1, n_pad), dtype=bool)
    mask[0, :n] = True
    co = np.zeros((1, n_pad, 2), dtype=np.int32)
    if coords is not None:
        co[0, :n] = np.asarray(coords, dtype=np.int32)[:n]
    return Bag(
        feats=jnp.asarray(out),
        mask=jnp.asarray(mask),
        coords=jnp.asarray(co),
        label=jnp.asarray([label], dtype=jnp.int32),
    )


def collate_bags(
    feats_list: Sequence[np.ndarray],
    coords_list: Sequence[np.ndarray | None],
    labels: Sequence[int],
    min_bucket: int = 256,
    max_patches: int = 65536,
    dtype=np.float32,
) -> Bag:
    """Collate several variable-length bags into one padded batch.

    All bags in the batch share one bucketed N_pad (the max length's bucket);
    the loader groups similar-length bags to minimise waste.
    """
    lens = [min(len(f), max_patches) for f in feats_list]
    n_pad = bucket_length(max(lens), min_bucket, max_patches)
    b = len(feats_list)
    d = feats_list[0].shape[1]
    feats = np.zeros((b, n_pad, d), dtype=dtype)
    mask = np.zeros((b, n_pad), dtype=bool)
    coords = np.zeros((b, n_pad, 2), dtype=np.int32)
    for i, (f, c) in enumerate(zip(feats_list, coords_list)):
        f = np.asarray(f)
        if len(f) > max_patches:
            idx = np.linspace(0, len(f) - 1, max_patches).astype(np.int64)
            f = f[idx]
            c = np.asarray(c)[idx] if c is not None else None
        n = len(f)
        feats[i, :n] = f
        mask[i, :n] = True
        if c is not None:
            coords[i, :n] = np.asarray(c, dtype=np.int32)[:n]
    return Bag(
        feats=jnp.asarray(feats),
        mask=jnp.asarray(mask),
        coords=jnp.asarray(coords),
        label=jnp.asarray(np.asarray(labels, dtype=np.int32)),
    )


def bucket_plan(lengths: Sequence[int], batch: int, min_bucket: int = 256,
                max_patches: int = 65536) -> List[List[int]]:
    """Group dataset indices into batches of similar bucketed length.

    Returns a list of index groups; each group's bags share one N_pad bucket
    so a batch never pays for one outlier slide.
    """
    order = np.argsort(np.asarray(lengths))
    groups: List[List[int]] = []
    cur: List[int] = []
    cur_bucket = None
    for i in order:
        b = bucket_length(int(lengths[i]), min_bucket, max_patches)
        if cur and (len(cur) >= batch or b != cur_bucket):
            groups.append(cur)
            cur = []
        cur.append(int(i))
        cur_bucket = b
    if cur:
        groups.append(cur)
    return groups

"""Bucketed bag loader with background prefetch.

Replaces the reference's torch DataLoader over in-RAM dicts
(`Step3_WSI_classification_ACMIL.py:129-135`). TPU-specific behaviour:

- batches are grouped by bucketed pad length (see :func:`bags.bucket_plan`)
  so XLA compiles one program per (B, N_pad) and padding waste stays <2x;
- a background thread overlaps host HDF5 reads + collation with device
  compute (double buffering; the reference used worker processes);
- with a mesh, batches are placed with a ``NamedSharding`` over the data
  axis so pjit'd steps consume them without a host gather. Ragged last
  batches are padded to the device count with mask=False rows.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional

import jax
import numpy as np

from acmil_tpu.data.bags import Bag, bucket_plan, collate_bags


class BagLoader:
    def __init__(
        self,
        source,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        min_bucket: int = 256,
        max_patches: int = 65536,
        seed: int = 0,
        mesh: Optional[jax.sharding.Mesh] = None,
        data_axis: str = "data",
        prefetch: int = 2,
        dtype=np.float32,
        cache_device: bool = False,
    ):
        """``cache_device=True`` materialises every batch on device once and
        replays it on later iterations — the right mode for val/test loaders
        that are re-evaluated every epoch (host→device bag transfer is the
        dominant cost on relay-attached chips; see BENCH_NOTES.md). Only
        valid when ``shuffle=False``."""
        self.source = source
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.min_bucket = min_bucket
        self.max_patches = max_patches
        self.rng = np.random.default_rng(seed)
        self.mesh = mesh
        self.data_axis = data_axis
        self.prefetch = prefetch
        self.dtype = dtype
        # cache_device + shuffle: batches are built (and placed on device)
        # once; epochs replay them in a fresh random ORDER. With B=1 this
        # is exactly shuffled training (every batch is one bag); with B>1
        # the within-batch composition is frozen after the first epoch.
        self.cache_device = cache_device
        self._device_batches = None
        self._device_groups = None
        self._sharding = None
        if mesh is not None:
            self._sharding = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(data_axis)
            )

    # -- batch plan ---------------------------------------------------------
    def _plan(self, shuffle: Optional[bool] = None) -> List[List[int]]:
        lengths = self.source.lengths() if hasattr(self.source, "lengths") else [
            len(self.source[i]["input"]) for i in range(len(self.source))
        ]
        groups = bucket_plan(lengths, self.batch_size, self.min_bucket, self.max_patches)
        if self.drop_last:
            groups = [g for g in groups if len(g) == self.batch_size]
        shuffle = self.shuffle if shuffle is None else shuffle
        if shuffle:
            # bucketing already randomises composition within a bucket only
            # weakly; shuffle group order every epoch (within-bucket order
            # was fixed by the sort, so also shuffle members).
            for g in groups:
                self.rng.shuffle(g)
            order = self.rng.permutation(len(groups))
            groups = [groups[i] for i in order]
        return groups

    def __len__(self) -> int:
        # shuffle=False: len() must not consume self.rng, or merely asking
        # for the length would change every later epoch's batch order
        return len(self._plan(shuffle=False))

    # -- collation ----------------------------------------------------------
    def _make_batch(self, idxs: List[int]) -> Bag:
        items = [self.source[i] for i in idxs]
        feats = [it["input"] for it in items]
        coords = [it.get("coords") for it in items]
        labels = [it["label"] for it in items]
        # Pad ragged batches up to a full device batch so sharded shapes are
        # static; padded rows get an all-False mask and label 0.
        target_b = self.batch_size if self._sharding is not None else len(items)
        while len(feats) < target_b:
            feats.append(np.zeros_like(np.asarray(feats[0][:1])))
            coords.append(None)
            labels.append(0)
        bag = collate_bags(feats, coords, labels, self.min_bucket, self.max_patches,
                           dtype=self.dtype)
        if len(items) < target_b:
            mask = np.array(bag.mask)  # writable copy
            mask[len(items):] = False
            bag = bag.replace(mask=jax.numpy.asarray(mask))
        if self._sharding is not None:
            bag = jax.device_put(bag, self._sharding)
        return bag

    # -- stacked shape groups (lax.scan epochs) ------------------------------
    def device_groups(self) -> List[Bag]:
        """Same-shape batches stacked along a new leading axis, resident on
        device — feeds the scan epoch drivers
        (:func:`acmil_tpu.engine.train.train_one_epoch_scanned` /
        :func:`evaluate_scanned`), which replace one dispatch per bag with
        one per shape group. Built once; epochs re-visit groups (and bags
        within a group) in fresh random order when ``shuffle`` is set.

        With a mesh, each stacked group is placed with the batch axis
        sharded over ``data`` (leading group axis replicated), so the
        scan step runs data-parallel with one dispatch per group — the
        mesh counterpart of the single-device scan epoch (VERDICT r2
        item 1b)."""
        if self._device_groups is None:
            import jax.numpy as jnp

            if self._sharding is not None:
                n_data = int(self.mesh.shape[self.data_axis])
                if self.batch_size % n_data:
                    raise ValueError(
                        f"scan epochs on a mesh need B ({self.batch_size}) "
                        f"divisible by the data axis ({n_data})")
            by_shape: dict = {}
            for g in self._plan():
                b = self._make_batch(g)
                by_shape.setdefault(
                    (b.feats.shape, str(b.feats.dtype)), []).append(b)
            groups = [
                jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *bs)
                for bs in by_shape.values()
            ]
            if self._sharding is not None:
                stacked_sh = jax.sharding.NamedSharding(
                    self.mesh,
                    jax.sharding.PartitionSpec(None, self.data_axis))
                groups = [jax.device_put(g, stacked_sh) for g in groups]
            self._device_groups = groups
        return self._device_groups

    # -- iteration ----------------------------------------------------------
    def __iter__(self) -> Iterator[Bag]:
        if self.cache_device:
            if self._device_batches is None:
                self._device_batches = [self._make_batch(g)
                                        for g in self._plan()]
            order = (self.rng.permutation(len(self._device_batches))
                     if self.shuffle else range(len(self._device_batches)))
            for i in order:
                yield self._device_batches[i]
            return
        groups = self._plan()
        if self.prefetch <= 0:
            for g in groups:
                yield self._make_batch(g)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        err: List[BaseException] = []
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that gives up when the consumer abandoned the
            # iterator — a plain q.put would block this thread forever,
            # pinning prefetch+1 collated (possibly device-put) batches
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for g in groups:
                    if not _put(self._make_batch(g)):
                        return
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                _put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            # runs on exhaustion AND on abandonment (GeneratorExit) or an
            # exception escaping the consuming epoch loop
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5)
        if err:
            raise err[0]

"""Patch pixel pipeline for feature extraction (Step2).

Reference: `datasets/dataset_h5.py:154` (`Whole_Slide_Bag_FP`): read coords
from the Step1 H5 and pull pixels live from the slide, with a
retry-at-coarser-level fallback (`dataset_h5.py:213-219`);
`Dataset_All_Bags:237` iterates a CSV manifest.

TPU redesign: instead of torch DataLoader worker processes, a background
thread reads+decodes+resizes patch batches (the C++ slide runtime already
parallelises tile decode internally) and hands fixed-shape uint8 batches
to the device — a double-buffered host→HBM pipeline. The last batch is
padded to the static batch size with a validity count.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Tuple

import cv2
import numpy as np


class H5PatchBatches:
    """Fixed-shape uint8 batches from patches stored IN the H5 file
    (`Whole_Slide_Bag`, `dataset_h5.py:48`: an ``imgs`` dataset of
    pre-extracted pixels + ``coords``), for pipelines that materialise
    patches instead of reading slides live."""

    def __init__(self, h5_path: str, target_size: int = 224,
                 batch_size: int = 256, imgs_key: str = "imgs"):
        import h5py

        self.h5_path = h5_path
        self.imgs_key = imgs_key
        self.target = target_size
        self.batch = batch_size
        with h5py.File(h5_path, "r") as f:
            self.n = f[imgs_key].shape[0]
            self.coords = np.asarray(f["coords"][:]) if "coords" in f else \
                np.zeros((self.n, 2), np.int64)

    def __len__(self):
        return -(-self.n // self.batch)

    def __iter__(self):
        import h5py

        with h5py.File(self.h5_path, "r") as f:
            dset = f[self.imgs_key]
            for i in range(0, self.n, self.batch):
                chunk = np.asarray(dset[i:i + self.batch])
                n = len(chunk)
                if chunk.shape[1:3] != (self.target, self.target):
                    chunk = np.stack([
                        cv2.resize(c, (self.target, self.target))
                        for c in chunk])
                out = np.zeros((self.batch, self.target, self.target, 3),
                               np.uint8)
                out[:n] = chunk[..., :3]
                yield out, self.coords[i:i + self.batch], n


class SlidePatchBatches:
    """Iterate fixed-shape uint8 patch batches from (slide, coords)."""

    def __init__(self, slide, coords: np.ndarray, patch_size_l0: int,
                 patch_level: int = 0, target_size: int = 224,
                 batch_size: int = 256, prefetch: int = 2):
        self.slide = slide
        self.coords = np.asarray(coords, np.int64)
        self.patch_level = patch_level
        self.patch_size_l0 = int(patch_size_l0)
        self.target = target_size
        self.batch = batch_size
        self.prefetch = prefetch

    def __len__(self):
        return -(-len(self.coords) // self.batch)

    def _read_patch(self, x: int, y: int) -> np.ndarray:
        lvl = self.patch_level
        size = max(int(self.patch_size_l0 /
                       self.slide.level_downsamples[lvl]), 1)
        try:
            img = self.slide.read_region((x, y), lvl, (size, size))
        except Exception:
            # retry at the next coarser level with halved patch size
            # (dataset_h5.py:213-219)
            lvl2 = min(lvl + 1, self.slide.level_count - 1)
            size2 = max(size // 2, 1)
            img = self.slide.read_region((x, y), lvl2, (size2, size2))
        if img.shape[0] != self.target:
            interp = (cv2.INTER_AREA if img.shape[0] > self.target
                      else cv2.INTER_LINEAR)
            img = cv2.resize(img, (self.target, self.target),
                             interpolation=interp)
        return img

    def _make(self, idxs) -> Tuple[np.ndarray, np.ndarray, int]:
        imgs = np.empty((self.batch, self.target, self.target, 3), np.uint8)
        n = len(idxs)
        for j, i in enumerate(idxs):
            imgs[j] = self._read_patch(*self.coords[i])
        if n < self.batch:
            imgs[n:] = 0
        return imgs, self.coords[idxs], n

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, int]]:
        order = np.arange(len(self.coords))
        batches = [order[i:i + self.batch]
                   for i in range(0, len(order), self.batch)]
        if self.prefetch <= 0:
            for b in batches:
                yield self._make(b)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        err = []

        def worker():
            try:
                for b in batches:
                    q.put(self._make(b))
            except BaseException as e:
                err.append(e)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item
        t.join()
        if err:
            raise err[0]

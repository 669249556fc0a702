"""Bag bucketing/collation + HDF5 round-trip + loader tests."""

import numpy as np
import pytest

from acmil_tpu.data.bags import bucket_length, bucket_plan, collate_bags, pad_bag
from acmil_tpu.data.h5io import FeatureBagSource, build_hdf5_feat_dataset, write_feature_h5
from acmil_tpu.data.loader import BagLoader
from tests.conftest import make_synthetic_bags


def test_bucket_length():
    assert bucket_length(1) == 256
    assert bucket_length(256) == 256
    assert bucket_length(257) == 512
    assert bucket_length(5000) == 8192
    assert bucket_length(10 ** 9, max_patches=65536) == 65536


def test_pad_bag():
    feats = np.random.randn(100, 16).astype(np.float32)
    coords = np.random.randint(0, 1000, (100, 2))
    bag = pad_bag(feats, coords, label=1, min_bucket=64)
    assert bag.feats.shape == (1, 128, 16)
    assert int(bag.mask.sum()) == 100
    assert int(bag.label[0]) == 1
    np.testing.assert_allclose(np.asarray(bag.feats[0, :100]), feats, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(bag.feats[0, 100:]), 0.0)


def test_pad_bag_oversize_subsamples():
    feats = np.random.randn(300, 4).astype(np.float32)
    bag = pad_bag(feats, None, 0, min_bucket=64, max_patches=128)
    assert bag.feats.shape[1] == 128
    assert int(bag.mask.sum()) == 128


def test_collate_shares_bucket():
    f = [np.random.randn(n, 8).astype(np.float32) for n in (30, 90, 120)]
    bag = collate_bags(f, [None] * 3, [0, 1, 0], min_bucket=64)
    assert bag.feats.shape == (3, 128, 8)
    np.testing.assert_array_equal(np.asarray(bag.lengths()), [30, 90, 120])


def test_bucket_plan_groups_by_bucket():
    lengths = [10, 20, 500, 600, 100, 550]
    groups = bucket_plan(lengths, batch=4, min_bucket=64)
    for g in groups:
        buckets = {bucket_length(lengths[i], 64) for i in g}
        assert len(buckets) == 1


def test_h5_roundtrip(tmp_path, synthetic_slides):
    path = str(tmp_path / "feats.h5")
    write_feature_h5(path, synthetic_slides)
    names = sorted(synthetic_slides)
    src = FeatureBagSource(path, names)
    assert len(src) == len(names)
    item = src[0]
    ref = synthetic_slides[names[0]]
    np.testing.assert_allclose(item["input"], ref["feat"].astype(np.float16),
                               rtol=1e-3, atol=1e-3)
    assert item["label"] == ref["label"]
    assert src.lengths() == [len(synthetic_slides[n]["feat"]) for n in names]


def test_build_dataset_splits(tmp_path, synthetic_slides, tiny_conf):
    path = str(tmp_path / "feats.h5")
    write_feature_h5(path, synthetic_slides)
    tiny_conf.split_dir = str(tmp_path / "nosplits")  # force name-based split
    train, val, test = build_hdf5_feat_dataset(path, tiny_conf)
    assert all("test" in n for n in test.names)
    assert not any("test" in n for n in train.names + val.names)
    assert len(val) >= 1
    assert set(train.names).isdisjoint(val.names)


def test_fewshot(tmp_path, synthetic_slides, tiny_conf):
    path = str(tmp_path / "feats.h5")
    write_feature_h5(path, synthetic_slides)
    tiny_conf.split_dir = str(tmp_path / "nosplits")
    tiny_conf.n_shot = 2
    train, _, _ = build_hdf5_feat_dataset(path, tiny_conf)
    labels = [train[i]["label"] for i in range(len(train))]
    for c in set(labels):
        assert labels.count(c) <= 2


@pytest.mark.parametrize("batch_size", [1, 4])
def test_loader_batches(tmp_path, synthetic_slides, batch_size):
    path = str(tmp_path / "feats.h5")
    write_feature_h5(path, synthetic_slides)
    src = FeatureBagSource(path, sorted(synthetic_slides))
    loader = BagLoader(src, batch_size=batch_size, shuffle=True, min_bucket=64,
                       seed=1)
    seen = 0
    for bag in loader:
        assert bag.feats.ndim == 3
        assert bag.feats.shape[0] <= batch_size
        assert bag.feats.shape[1] % 64 == 0
        seen += bag.feats.shape[0]
    assert seen == len(src)

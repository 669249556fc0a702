from acmil_tpu.data.bags import Bag, bucket_length, pad_bag, collate_bags
from acmil_tpu.data.h5io import (
    FeatureBagSource,
    write_feature_h5,
    build_hdf5_feat_dataset,
)
from acmil_tpu.data.loader import BagLoader

__all__ = [
    "Bag",
    "bucket_length",
    "pad_bag",
    "collate_bags",
    "FeatureBagSource",
    "write_feature_h5",
    "build_hdf5_feat_dataset",
    "BagLoader",
]

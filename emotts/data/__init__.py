from emotts.data.datasets import (
    FS2Dataset,
    FS2Example,
    RankPairDataset,
    RankPairExample,
    collate_fs2,
    collate_rank_pairs,
    pick_bucket,
)
from emotts.data.loader import BucketLoader
from emotts.data.preprocess import (
    average_by_duration,
    expand_by_duration,
    feature_extraction,
    preprocess_all,
)
from emotts.data.splits import build_fs2_splits, build_rank_pair_lists

__all__ = [
    "FS2Dataset",
    "FS2Example",
    "RankPairDataset",
    "RankPairExample",
    "collate_fs2",
    "collate_rank_pairs",
    "pick_bucket",
    "BucketLoader",
    "average_by_duration",
    "expand_by_duration",
    "feature_extraction",
    "preprocess_all",
    "build_fs2_splits",
    "build_rank_pair_lists",
]

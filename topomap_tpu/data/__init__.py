from topomap_tpu.data.pairs import (
    PairsRecord,
    read_pairs_jsonl,
    write_pairs_jsonl,
    stratified_split,
    stratified_split_ratio,
    PairsDataset,
    RepeatDataset,
)
from topomap_tpu.data.prefetch import DevicePrefetcher
from topomap_tpu.data.synthetic import SyntheticTileConfig, generate_pair, generate_pairs_dataset

__all__ = [
    "PairsRecord",
    "read_pairs_jsonl",
    "write_pairs_jsonl",
    "stratified_split",
    "stratified_split_ratio",
    "PairsDataset",
    "RepeatDataset",
    "SyntheticTileConfig",
    "generate_pair",
    "generate_pairs_dataset",
    "DevicePrefetcher",
]

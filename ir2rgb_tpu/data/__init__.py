from .folder import (
    IMG_EXTENSIONS,
    find_aligned_pairs,
    find_temporal_sequences,
    make_dataset,
)
from .loader import DataLoader, create_dataloader
from .synthetic import synthetic_pair_batch, write_synthetic_dataset
from .transforms import preprocess_pair_batch, preprocess_sequence_batch

__all__ = [
    "IMG_EXTENSIONS",
    "make_dataset",
    "find_aligned_pairs",
    "find_temporal_sequences",
    "DataLoader",
    "create_dataloader",
    "preprocess_pair_batch",
    "preprocess_sequence_batch",
    "synthetic_pair_batch",
    "write_synthetic_dataset",
]

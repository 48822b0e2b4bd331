"""Data pipeline package.

Lazy exports (PEP 562): thin-client processes (the serving protocol
client, video IO — see examples/serve_video.py) import submodules like
``ir2rgb_tpu.data.video`` without paying for the loader/transform
stack's jax import (which, on a shared dev box, can also claim the
accelerator)."""

_EXPORTS = {
    "IMG_EXTENSIONS": ".folder",
    "make_dataset": ".folder",
    "find_aligned_pairs": ".folder",
    "find_temporal_sequences": ".folder",
    "DataLoader": ".loader",
    "create_dataloader": ".loader",
    "preprocess_pair_batch": ".transforms",
    "preprocess_sequence_batch": ".transforms",
    "synthetic_pair_batch": ".synthetic",
    "write_synthetic_dataset": ".synthetic",
}

__all__ = list(_EXPORTS)

from ir2rgb_tpu._lazy import lazy_exports

__getattr__ = lazy_exports(__name__, _EXPORTS, globals())

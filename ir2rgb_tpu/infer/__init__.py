"""Inference/serving package. Lazy exports (PEP 562) — the network
protocol pieces (``infer.server``) import without jax; see
data/__init__ for the rationale."""

_EXPORTS = {
    "ExportedStream": ".export",
    "export_multistream_artifact": ".export",
    "export_serving_artifact": ".export",
    "load_multistream_artifact": ".export",
    "load_serving_artifact": ".export",
    "collect_dataset_features": ".features",
    "kmeans": ".features",
    "load_clusters": ".features",
    "sample_feature_map": ".features",
    "save_clusters": ".features",
    "flicker": ".metrics",
    "psnr": ".metrics",
    "ssim": ".metrics",
    "MultiStreamServer": ".multistream",
    "FrameServer": ".server",
    "FrameClient": ".server",
    "StreamingGenerator": ".stream",
    "label2im": ".stream",
    "single_frame_infer": ".stream",
    "tensor2im": ".stream",
    "translate_clip": ".stream",
}

__all__ = list(_EXPORTS)

from ir2rgb_tpu._lazy import lazy_exports

__getattr__ = lazy_exports(__name__, _EXPORTS, globals())

"""Observability package. Lazy exports (PEP 562) — see data/__init__."""

_EXPORTS = {
    "HTMLPage": ".html",
    "Visualizer": ".visualizer",
    "AsyncImageWriter": ".writer",
    "MJPEGAviWriter": ".video",
    "read_mjpeg_avi": ".video",
}

__all__ = list(_EXPORTS)

from ir2rgb_tpu._lazy import lazy_exports

__getattr__ = lazy_exports(__name__, _EXPORTS, globals())

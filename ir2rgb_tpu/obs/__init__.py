"""Observability package. Lazy exports (PEP 562) — see data/__init__."""

_EXPORTS = {
    "HTMLPage": ".html",
    "Visualizer": ".visualizer",
    "AsyncImageWriter": ".writer",
    "MJPEGAviWriter": ".video",
    "read_mjpeg_avi": ".video",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute "
                             f"{name!r}")
    import importlib
    return getattr(importlib.import_module(mod, __name__), name)

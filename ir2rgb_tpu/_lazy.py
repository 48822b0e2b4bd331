"""Shared PEP 562 lazy-export machinery for package ``__init__``s.

Thin-client processes (the serving protocol client, video IO — see
examples/serve_video.py) import submodules like ``ir2rgb_tpu.data.video``
without paying for the loader/transform stack's jax import (which, on a
shared dev box, can also claim the accelerator). Each lazy package
declares ``{export_name: ".submodule"}`` and binds the returned function
as its module-level ``__getattr__``.
"""

import importlib


def lazy_exports(pkg_name: str, exports: dict, pkg_globals: dict):
    """Build a module ``__getattr__`` resolving *exports* lazily.

    Resolved attributes are cached into *pkg_globals*, so each name pays
    the import + lookup once; later accesses never re-enter
    ``__getattr__``.
    """

    def __getattr__(name: str):
        mod = exports.get(name)
        if mod is None:
            raise AttributeError(f"module {pkg_name!r} has no attribute "
                                 f"{name!r}")
        val = getattr(importlib.import_module(mod, pkg_name), name)
        pkg_globals[name] = val
        return val

    return __getattr__

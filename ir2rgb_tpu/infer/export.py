"""AOT serving artifacts: export the compiled serving step to one file.

The reference deploys by shipping the research repo + a ``.pth`` file and
re-running ``test.py`` (SURVEY.md §3.2) — serving requires the full model
code and pays tracing + compile at every process start. TPU-native
deployment wants a sealed artifact instead: this module exports the
uint8-wire serving step (normalize -> G forward -> quantize, with the
temporal carry threaded through) via ``jax.export`` to portable
StableHLO, and packs it with the generator weights and geometry metadata
into a single ``.ir2rgb`` zip.

Properties:

- **Self-contained**: ``load_serving_artifact`` needs only this module,
  not the network zoo / config system — the program IS the lowered
  generator. Model-code drift cannot change a deployed artifact.
- **Multi-platform**: exported for TPU and CPU by default (one artifact
  serves production chips and CPU CI).
- **No tracing at serve time**: load deserializes StableHLO and hands it
  straight to XLA — Python never re-traces the model (compile itself is
  still per-topology, as it must be).
- **Exact**: the packed step is the same jitted function
  ``StreamingGenerator`` runs — outputs match the live path bit-for-bit
  on CPU (tested); on TPU the multi-platform lowering compiles
  marginally differently (measured max 3/255 LSB at 512p).
- **Fast cold start**: measured on a v5e chip, artifact
  load+compile+first-frame is 7.2x faster than the live path's
  trace+compile+first-frame (42 s vs 307 s through the dev relay) —
  StableHLO skips tracing and most of the HLO pipeline.

File layout (zip): ``program.bin`` (serialized jax.export artifact),
``meta.json`` (wire geometry, carry spec, param tree paths/dtypes),
``param_<i>.npy`` (weights, stored f32, cast back on load — bf16
round-trips losslessly).
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ir2rgb_tpu.infer.stream import _dev_normalize, _dev_quantize

_FORMAT_VERSION = 1
# multi-stream artifacts carry a DIFFERENT program signature (masks +
# per-slot carry); they get their own version so a pre-multistream
# loader refuses them cleanly instead of failing with an arity error
_FORMAT_VERSION_MULTI = 2
_KNOWN_VERSIONS = (_FORMAT_VERSION, _FORMAT_VERSION_MULTI)


def _flatten_params(params):
    """Nested-dict param tree -> (paths as str lists, leaves)."""
    entries, _ = jax.tree_util.tree_flatten_with_path(params)
    paths, leaves = [], []
    for path, leaf in entries:
        keys = []
        for k in path:
            if not hasattr(k, "key") or not isinstance(k.key, str):
                raise TypeError(
                    f"param tree has non-dict node {k!r}; the artifact "
                    f"format stores string-keyed nested dicts only")
            keys.append(k.key)
        paths.append(keys)
        leaves.append(leaf)
    return paths, leaves


def _empty_dict_paths(tree, prefix=()) -> List[List[str]]:
    """Paths of empty-dict nodes (e.g. non-affine norms contribute
    ``{'norm': {}}``) — flattening drops them, but the exported treedef
    requires them, so they are recorded in meta explicitly."""
    out: List[List[str]] = []
    if isinstance(tree, dict):
        if not tree:
            out.append(list(prefix))
        for k, v in tree.items():
            out.extend(_empty_dict_paths(v, prefix + (k,)))
    return out


def _unflatten_params(paths: Sequence[Sequence[str]], leaves,
                      empty_paths: Sequence[Sequence[str]] = ()):
    root: dict = {}
    for keys, leaf in zip(paths, leaves):
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = leaf
    for keys in empty_paths:
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = {}
    return root


def _build_step(model, temporal: bool, carry_c: int):
    """The uint8-wire serving step — identical math to
    ``StreamingGenerator``'s ``step_u8`` (stream.py). label_nc models
    ship raw class-id bytes on the wire (no [-1,1] normalize; generate()
    one-hot encodes on device)."""
    pre = ((lambda x: x.astype(jnp.float32))
           if model.cfg.model.label_nc > 0 else _dev_normalize)
    if temporal:
        def step(params, a_u8, carry):
            fake = model.generate(params, pre(a_u8),
                                  prev=carry, train=False)
            fake32 = fake.astype(jnp.float32)
            new_carry = jnp.concatenate([fake32, carry],
                                        axis=-1)[..., :carry_c]
            return _dev_quantize(fake), new_carry
    else:
        def step(params, a_u8):
            return _dev_quantize(model.generate(params,
                                                pre(a_u8),
                                                train=False))
    return step


def _check_exportable(cfgm, model) -> None:
    if model.enc_cfg is not None or cfgm.use_instance_edges:
        # the sealed wire is uint8 frames only; exporting a
        # feature/edge-conditioned model would bake the zeros prior in
        # and silently drop style control — refuse instead
        raise ValueError(
            "serving artifacts carry only the uint8 frame input; "
            "use_instance_feat/use_instance_edges models need instance "
            "maps per frame — serve them through cli/infer.py (or "
            "StreamingGenerator.push_device(feat=, edges=)) instead")
    if cfgm.label_nc > 256:
        raise ValueError(
            f"label_nc={cfgm.label_nc} class ids do not fit the uint8 "
            "serving wire; serve through cli/infer.py instead")


def _write_artifact(path: str, exported, g_params, meta: dict,
                    version: int = _FORMAT_VERSION) -> None:
    paths, leaves = _flatten_params(g_params)
    meta = dict(meta,
                format_version=version,
                param_paths=paths,
                param_dtypes=[str(l.dtype) for l in leaves],
                empty_param_paths=_empty_dict_paths(g_params))
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("program.bin", bytes(exported.serialize()))
        zf.writestr("meta.json", json.dumps(meta))
        for i, leaf in enumerate(leaves):
            buf = io.BytesIO()
            np.save(buf, np.asarray(leaf).astype(np.float32))
            zf.writestr(f"param_{i}.npy", buf.getvalue())


def _export_prologue(model, g_params, platforms):
    """The shared derivations both exporters must agree on (exportability
    rules, wire channels, carry spec, param structs) — one definition so
    the two artifact kinds cannot drift."""
    cfgm = model.cfg.model
    _check_exportable(cfgm, model)
    temporal = cfgm.model == "temporal"
    n_prev = (cfgm.n_frames_g - 1) if temporal else 0
    carry_c = cfgm.output_nc * n_prev
    wire_nc = 1 if cfgm.label_nc > 0 else cfgm.input_nc
    platforms = list(("tpu", "cpu") if platforms is None else platforms)
    p_struct = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), g_params)
    return cfgm, temporal, carry_c, wire_nc, platforms, p_struct


def _base_meta(cfgm, temporal, carry_c, wire_nc, h, w, batch, platforms
               ) -> dict:
    return {
        "temporal": temporal,
        "frame_hw": [h, w],
        "batch": batch,
        "input_nc": wire_nc,
        "label_nc": cfgm.label_nc,
        "output_nc": cfgm.output_nc,
        "carry_c": carry_c,
        "platforms": platforms,
    }


def export_serving_artifact(model, g_params, frame_hw: Tuple[int, int],
                            path: str, batch: int = 1,
                            platforms: Optional[Sequence[str]] = None
                            ) -> None:
    """Export ``model``'s serving step + ``g_params`` to ``path``.

    ``platforms`` defaults to ``('tpu', 'cpu')`` — one artifact for
    production and CPU CI. ``batch`` fixes the slot count; for true
    multi-stream serving (independent carries, join/leave masks) use
    :func:`export_multistream_artifact` instead.
    """
    cfgm, temporal, carry_c, wire_nc, platforms, p_struct = \
        _export_prologue(model, g_params, platforms)
    h, w = frame_hw
    step = _build_step(model, temporal, carry_c)
    a_struct = jax.ShapeDtypeStruct((batch, h, w, wire_nc), jnp.uint8)
    args = (p_struct, a_struct)
    if temporal:
        args += (jax.ShapeDtypeStruct((batch, h, w, carry_c),
                                      jnp.float32),)
    exported = jax.export.export(jax.jit(step),
                                 platforms=platforms)(*args)
    _write_artifact(path, exported, g_params,
                    _base_meta(cfgm, temporal, carry_c, wire_nc, h, w,
                               batch, platforms))


def export_multistream_artifact(model, g_params,
                                frame_hw: Tuple[int, int], path: str,
                                n_slots: int = 8,
                                platforms: Optional[Sequence[str]] = None
                                ) -> None:
    """Seal the MULTI-STREAM batched tick (infer/multistream.py) into a
    ``.ir2rgb`` artifact: N independent streams with per-slot carries
    and join/leave/skip masks, servable by
    ``MultiStreamServer.from_artifact`` (and therefore ``ir2rgb-serve
    --artifact``) with no model code and no trace at startup — the
    cold-start cut matters most for a long-lived daemon.

    ``n_slots`` is the sealed physical batch; pick a measured-good size
    (1, 2, or a multiple of 8 on TPU — DESIGN.md §6's mid-batch cliff).
    """
    from ir2rgb_tpu.infer.multistream import build_tick
    cfgm, temporal, carry_c, wire_nc, platforms, p_struct = \
        _export_prologue(model, g_params, platforms)
    h, w = frame_hw
    s = int(n_slots)
    tick = build_tick(model, temporal, carry_c)
    frames = jax.ShapeDtypeStruct((s, h, w, wire_nc), jnp.uint8)
    mask = jax.ShapeDtypeStruct((s,), jnp.bool_)
    if temporal:
        carry = jax.ShapeDtypeStruct((s, h, w, carry_c), jnp.float32)
        args = (p_struct, frames, carry, mask, mask)
    else:
        args = (p_struct, frames, mask, mask)
    exported = jax.export.export(jax.jit(tick),
                                 platforms=platforms)(*args)
    meta = _base_meta(cfgm, temporal, carry_c, wire_nc, h, w, s,
                      platforms)
    meta["multistream"] = True
    _write_artifact(path, exported, g_params, meta,
                    version=_FORMAT_VERSION_MULTI)


class ExportedStream:
    """Serve from an artifact — the ``StreamingGenerator`` surface
    (push / stream / reset) without any model code behind it."""

    def __init__(self, exported, params, meta: dict):
        self._fn = jax.jit(exported.call)
        self._params = params
        self.meta = meta
        self.temporal = meta["temporal"]
        self.batch = meta["batch"]
        h, w = meta["frame_hw"]
        self._carry = (jnp.zeros((self.batch, h, w, meta["carry_c"]),
                                 jnp.float32) if self.temporal else None)

    def reset(self) -> None:
        if self._carry is not None:
            self._carry = jnp.zeros_like(self._carry)

    def _dispatch(self, a_host: np.ndarray) -> jax.Array:
        a = np.asarray(a_host)
        if a.ndim == 3:
            a = a[None]
        if a.dtype != np.uint8:
            # accept non-uint8 frames on the wire too — ONE shared
            # conversion (stream.host_to_wire_u8) keeps this path
            # bit-identical to the live and multi-stream surfaces
            from ir2rgb_tpu.infer.stream import host_to_wire_u8
            a = host_to_wire_u8(a, self.meta.get("label_nc", 0) > 0)
        a_dev = jnp.asarray(a)
        if self.temporal:
            out, self._carry = self._fn(self._params, a_dev, self._carry)
            return out
        return self._fn(self._params, a_dev)

    @staticmethod
    def _fetch(out: jax.Array) -> np.ndarray:
        arr = np.asarray(jax.device_get(out))
        return arr[0] if arr.shape[0] == 1 else arr

    def push(self, a_host: np.ndarray) -> np.ndarray:
        """uint8 (or [-1,1] float) IR frame in, uint8 RGB out."""
        return self._fetch(self._dispatch(a_host))

    def stream(self, frames: Iterable[np.ndarray]) -> Iterator[np.ndarray]:
        """Depth-1 pipelined loop (see StreamingGenerator.stream)."""
        pending = None
        for a_host in frames:
            out = self._dispatch(a_host)
            if pending is not None:
                yield self._fetch(pending)
            pending = out
        if pending is not None:
            yield self._fetch(pending)


def _read_artifact(path: str):
    with zipfile.ZipFile(path, "r") as zf:
        meta = json.loads(zf.read("meta.json"))
        if meta["format_version"] not in _KNOWN_VERSIONS:
            raise ValueError(
                f"artifact format v{meta['format_version']} not in "
                f"{_KNOWN_VERSIONS} supported by this loader")
        exported = jax.export.deserialize(bytearray(zf.read("program.bin")))
        leaves: List[jax.Array] = []
        for i, dt in enumerate(meta["param_dtypes"]):
            arr = np.load(io.BytesIO(zf.read(f"param_{i}.npy")))
            leaves.append(jnp.asarray(arr, dtype=jnp.dtype(dt)))
    params = _unflatten_params(meta["param_paths"], leaves,
                               meta.get("empty_param_paths", ()))
    return exported, params, meta


def load_serving_artifact(path: str) -> ExportedStream:
    """Load an ``.ir2rgb`` artifact written by
    :func:`export_serving_artifact` and return a ready serving stream."""
    exported, params, meta = _read_artifact(path)
    if meta.get("multistream"):
        raise ValueError(
            f"{path} is a MULTI-STREAM artifact (per-slot carries + "
            f"masks); load it with MultiStreamServer.from_artifact "
            f"(or serve it with ir2rgb-serve --artifact)")
    return ExportedStream(exported, params, meta)


def load_multistream_artifact(path: str):
    """Load a multi-stream artifact written by
    :func:`export_multistream_artifact`; returns ``(tick_callable,
    params, meta)`` for ``MultiStreamServer.from_artifact``."""
    exported, params, meta = _read_artifact(path)
    if not meta.get("multistream"):
        raise ValueError(
            f"{path} is a single-stream artifact; load it with "
            f"load_serving_artifact (or re-export with "
            f"export_multistream_artifact / ir2rgb-export --slots N)")
    return exported.call, params, meta

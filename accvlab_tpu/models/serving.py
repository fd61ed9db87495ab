"""Production inference export: self-contained AOT serving artifacts.

The training side of this repo already has durable state (orbax
checkpoints, ``models/checkpoint.py``); this module covers the OTHER
production artifact — a **deployable inference function**. A serving host
should not need the model class, flax, or even this package's model code
to run inference: it needs a single file that carries the compiled-ready
program *and* the weights.

``jax.export`` provides the TPU-native substrate: the traced program
serializes as versioned StableHLO with shape/dtype/sharding calling
conventions, is loadable by any future jax (forward-compatibility
guarantees), and retargets TPU/CPU at load time — the XLA analog of the
reference's deployment story (TensorRT-style frozen engines in the NVIDIA
stack; the reference itself ships none, so this is capability beyond
parity, built the TPU way).

What this module adds over raw ``jax.export``:

* **Weights baked in** — :func:`export_inference` closes the params over
  the function before tracing, so they serialize as program constants and
  the artifact is self-contained (one file = model).
* **Batch polymorphism** — ``batch_polymorphic=True`` exports with a
  symbolic leading dimension, so ONE artifact serves any batch size with
  no re-export (each distinct size still gets its own XLA compile at the
  serving host, as with any jit).
* **A versioned file format** — magic + JSON header (framework version,
  jax version, input/output tree structure, platforms) ahead of the
  StableHLO payload, so a fleet can audit artifacts without deserializing
  them (:func:`read_artifact_info`).
* **Mesh re-binding** — sharded exports record shardings by mesh *axis
  name*; :func:`load_inference` accepts a ``mesh`` and calls the program
  under it, so an artifact exported on one host serves on any same-shape
  mesh (the same restore-on-resize contract as ``models/checkpoint.py``).

Typical flow::

    fn = lambda images: model.apply(params, images)        # or freeze below
    save_inference(path, model.apply, params, example_images)
    ...
    serve = load_inference(path)                           # no model code
    out = serve(images)                                    # pytree out
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Callable, Optional, Sequence, Tuple

import numpy as np

_MAGIC = b"ACCVLAB-SERVE\x00"
_FORMAT_VERSION = 1


# --------------------------------------------------------------------------- #
# artifact container
# --------------------------------------------------------------------------- #


def _header(exported, batch_polymorphic: bool) -> dict:
    import jax

    from accvlab_tpu import __version__

    return {
        "format_version": _FORMAT_VERSION,
        "accvlab_tpu_version": __version__,
        "jax_version": jax.__version__,
        "fn_name": exported.fun_name,
        "platforms": list(exported.platforms),
        "batch_polymorphic": bool(batch_polymorphic),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "nr_devices": int(exported.nr_devices),
    }


def _pack(header: dict, payload: bytes) -> bytes:
    hj = json.dumps(header, sort_keys=True).encode("utf-8")
    if len(payload) >= 1 << 32 or len(hj) >= 1 << 32:
        # the <II length fields cap the format at 4 GiB per section (~1B
        # f32 params baked in); quantize (models/quantize.py) or shard the
        # weights before exporting at that scale
        raise ValueError(
            f"serving artifact section too large for the v{_FORMAT_VERSION} "
            f"format (payload {len(payload)} bytes, limit 4 GiB); use "
            "models.quantize or ship params separately"
        )
    return _MAGIC + struct.pack("<II", len(hj), len(payload)) + hj + payload


def _unpack(data: bytes) -> Tuple[dict, bytes]:
    if not data.startswith(_MAGIC):
        raise ValueError(
            "not an accvlab_tpu serving artifact (bad magic); did you pass "
            "an orbax checkpoint or a raw jax.export blob?"
        )
    off = len(_MAGIC)
    if len(data) < off + 8:
        raise ValueError("truncated serving artifact")
    hlen, plen = struct.unpack_from("<II", data, off)
    off += 8
    header = json.loads(data[off : off + hlen].decode("utf-8"))
    if header.get("format_version", 0) > _FORMAT_VERSION:
        raise ValueError(
            f"serving artifact format {header['format_version']} is newer "
            f"than this accvlab_tpu understands ({_FORMAT_VERSION})"
        )
    payload = data[off + hlen : off + hlen + plen]
    if len(payload) != plen:
        raise ValueError("truncated serving artifact")
    return header, payload


def _read_bytes(path_or_bytes) -> bytes:
    if isinstance(path_or_bytes, (bytes, bytearray)):
        return bytes(path_or_bytes)
    with open(path_or_bytes, "rb") as f:
        return f.read()


def read_artifact_info(path_or_bytes) -> dict:
    """Audit an artifact WITHOUT deserializing the program: returns the
    JSON header (versions, platforms, avals, device count)."""
    header, _ = _unpack(_read_bytes(path_or_bytes))
    return header


# --------------------------------------------------------------------------- #
# export
# --------------------------------------------------------------------------- #


def _symbolic_batch_args(example_args):
    """Replace every leaf's leading dim with ONE shared symbolic size."""
    import jax
    from jax import export as jexport

    (b,) = jexport.symbolic_shape("b")

    def sym(leaf):
        arr = np.asarray(leaf) if not hasattr(leaf, "dtype") else leaf
        if getattr(arr, "ndim", 0) < 1:
            raise ValueError(
                "batch_polymorphic=True needs every input leaf to have a "
                f"leading batch dimension; got shape {getattr(arr, 'shape', ())}"
            )
        return jax.ShapeDtypeStruct((b,) + tuple(arr.shape[1:]), arr.dtype)

    return jax.tree_util.tree_map(sym, example_args)


def export_inference(
    fn: Callable,
    example_args: Tuple,
    *,
    batch_polymorphic: bool = False,
    platforms: Optional[Sequence[str]] = None,
    mesh=None,
    in_shardings=None,
) -> bytes:
    """Export ``fn(*example_args)`` as a self-contained serving artifact.

    ``fn`` must be a closed inference function (weights captured — see
    :func:`save_inference` for the params-baking convenience). Returns the
    artifact bytes; write them anywhere (or use :func:`save_inference`).

    Args:
        batch_polymorphic: export with a shared symbolic leading dim so one
            artifact serves every batch size.
        platforms: lowering targets (e.g. ``("tpu", "cpu")``); defaults to
            jax's default backend. A multi-platform artifact serves on any
            listed backend.
        mesh / in_shardings: export a sharded program — ``fn`` is jitted
            with these shardings and the artifact records them by axis
            name; load with ``load_inference(path, mesh=serving_mesh)``.
    """
    import jax
    from jax import export as jexport

    if (mesh is None) != (in_shardings is None):
        raise ValueError("mesh and in_shardings must be given together")
    if mesh is not None and batch_polymorphic:
        raise ValueError(
            "batch_polymorphic sharded export is not supported: the symbolic "
            "batch dimension cannot be validated against the mesh axis size "
            "at export time"
        )

    if mesh is not None:
        jitted = jax.jit(fn, in_shardings=in_shardings)
    else:
        jitted = jax.jit(fn)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)

    if batch_polymorphic:
        trace_args = _symbolic_batch_args(example_args)
    else:
        trace_args = jax.tree_util.tree_map(
            lambda leaf: jax.ShapeDtypeStruct(
                np.shape(leaf), np.asarray(leaf).dtype if not hasattr(leaf, "dtype") else leaf.dtype
            ),
            example_args,
        )
    with mesh or _nullcontext():
        exported = jexport.export(jitted, **kwargs)(*trace_args)
    return _pack(_header(exported, batch_polymorphic), exported.serialize())


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *exc):
        return False


def freeze_params(apply_fn: Callable, params) -> Callable:
    """Close ``apply_fn`` (e.g. ``model.apply``) over ``params`` so the
    weights trace as constants and serialize into the artifact."""

    def frozen(*args):
        return apply_fn(params, *args)

    return frozen


def save_inference(
    path: str,
    apply_fn: Callable,
    params,
    *example_args,
    **export_kwargs,
) -> dict:
    """Bake ``params`` into ``apply_fn`` and write the artifact to ``path``.

    Returns the artifact header (what :func:`read_artifact_info` reads).
    Write is atomic (tmp + rename) — a serving host never sees a torn file.
    """
    data = export_inference(
        freeze_params(apply_fn, params), example_args, **export_kwargs
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return read_artifact_info(data)


# --------------------------------------------------------------------------- #
# load / serve
# --------------------------------------------------------------------------- #


class LoadedInference:
    """A deserialized serving artifact: call it like the original fn.

    Attributes:
        info: the artifact header dict.
    """

    def __init__(self, exported, info: dict, mesh=None):
        import jax

        self._exported = exported
        self.info = dict(info)
        self._mesh = mesh
        nr = int(info.get("nr_devices", 1))
        if nr > 1 and mesh is None:
            raise ValueError(
                f"artifact was exported for {nr} devices; "
                "pass mesh= with that many devices to load_inference"
            )
        if mesh is not None and mesh.size != nr:
            raise ValueError(
                f"artifact was exported for {nr} devices but the serving "
                f"mesh has {mesh.size}; shapes and shardings re-bind only "
                "onto a same-size mesh"
            )
        call = exported.call
        if mesh is not None:
            jitted = jax.jit(call)
            # fixed at load time: the artifact's recorded shardings bound to
            # THIS mesh (reconstructing NamedShardings per call would tax
            # every dispatch)
            shardings = tuple(exported.in_shardings_jax(mesh))
            tree_flatten = jax.tree_util.tree_flatten
            tree_unflatten = jax.tree_util.tree_unflatten
            device_put = jax.device_put

            def call_under_mesh(*args):
                # place inputs on the serving mesh per the recorded
                # shardings — host (numpy) arrays would otherwise trace in a
                # 1-device context and the exported program rejects the
                # device-count mismatch
                flat, in_tree = tree_flatten((args, {}))
                placed = [
                    x if s is None else device_put(x, s)
                    for x, s in zip(flat, shardings)
                ]
                args2, _ = tree_unflatten(in_tree, placed)
                with mesh:
                    return jitted(*args2)

            self._call = call_under_mesh
        else:
            self._call = jax.jit(call)

    def __call__(self, *args):
        return self._call(*args)


def load_inference(path_or_bytes, *, mesh=None) -> LoadedInference:
    """Load a serving artifact; no model code or params needed.

    Args:
        mesh: required for sharded artifacts (``nr_devices > 1``) — any
            mesh whose axis names/sizes match the exporting mesh; the
            program's recorded shardings re-bind to it by axis name.
    """
    from jax import export as jexport

    header, payload = _unpack(_read_bytes(path_or_bytes))
    exported = jexport.deserialize(bytearray(payload))
    return LoadedInference(exported, header, mesh=mesh)

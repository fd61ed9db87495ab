"""Dump-and-compare harness for numerical debugging (TPU-native re-design of
``optim_test_tools/accvlab/optim_test_tools/tensor_dumper.py:70-1723``).

Same capability surface: a singleton that collects named tensors (and
gradients) under hierarchical ranges, dumps them per iteration as JSON plus
binary/image/pickle side files, and in compare mode diffs the current values
against a previously dumped run with tolerances. Works on any array type
(JAX arrays, numpy, nested dict/list structures, :class:`RaggedBatch`).

JAX adaptation: the reference captures gradients with
``torch.autograd.grad`` at ``set_gradients`` time; in JAX gradients are
explicit values, so :meth:`add_grad_data` stores the *tensor* and
:meth:`set_gradients` receives the corresponding gradient structure(s)
computed by the caller (e.g. from ``jax.value_and_grad``), matched by
registration order.
"""

from __future__ import annotations

import json
import os
import pickle
from enum import Enum
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import numpy as np

from .singleton_base import SingletonBase


def _to_numpy(x):
    return np.asarray(x)


class TensorDumper(SingletonBase):
    """Singleton dump-and-compare harness. See module docstring.

    Usage::

        td = TensorDumper()
        td.enable("/tmp/dumps")
        td.push_range("step0")
        td.add_tensor_data("inputs", {"img": batch_img}, TensorDumper.Type.BINARY)
        td.pop_range()
        td.dump()

        # later, against a reference run:
        td.enable("/tmp/dumps_new")
        td.set_dump_is_compare("/tmp/dumps")
        ...
        errors = td.compare_to_dumped_data(eps_numerical_data=1e-6)
    """

    class Type(Enum):
        """Dump format types (parity: ``tensor_dumper.py:113-166``)."""

        JSON = 0  #: nested lists inside the main JSON file
        BINARY = 1  #: .npy side file + .meta.json with shape/dtype
        IMAGE_RGB = 2  #: PNG, channel-last RGB
        IMAGE_BGR = 3  #: PNG, channel-last BGR
        IMAGE_I = 4  #: PNG, grayscale
        PICKLE = 5  #: pickle side file

        @classmethod
        def is_image(cls, dump_type: "TensorDumper.Type") -> bool:
            return dump_type in (cls.IMAGE_RGB, cls.IMAGE_BGR, cls.IMAGE_I)

    def __init__(self, *args, **kwargs):
        if self._singleton_initialized:
            return
        self._singleton_initialized = True
        self._enabled = False
        self._dump_dir: Optional[str] = None
        self._compare_dir: Optional[str] = None
        self._dump_is_compare = False
        self._compare_params: Dict[str, Any] = {}
        self._dump_count = 0
        self._range_stack: List[str] = []
        self._data: Dict[str, Any] = {}
        self._entry_types: Dict[str, "TensorDumper.Type"] = {}
        self._grad_entries: List[str] = []
        self._pending_grad_paths: List[str] = []
        self._custom_converters: Dict[type, Callable] = {}
        self._after_count_actions: List[tuple] = []
        self._ragged_as_per_sample = False
        self._ragged_enabled = False

    # ------------------------------------------------------------------ #
    # Lifecycle                                                          #
    # ------------------------------------------------------------------ #

    def enable(self, dump_dir: str):
        """Enable dumping into ``dump_dir`` (created if missing). Can only be
        enabled once (parity: ``tensor_dumper.py:233`` raises on re-enable)."""
        if self._enabled:
            raise RuntimeError(
                "`TensorDumper` is already enabled. Can only be enabled once."
            )
        self._enabled = True
        self._dump_dir = dump_dir
        os.makedirs(dump_dir, exist_ok=True)
        self._dump_count = 0
        self._clear_iteration()

    def disable(self):
        self._enabled = False

    @property
    def is_enabled(self) -> bool:
        """Whether the TensorDumper is enabled (a property, like the
        reference's ``:338``)."""
        return self._enabled

    def set_dump_is_compare(
        self,
        eps_numerical_data: float = 1e-6,
        num_errors_per_tensor_to_show: int = 1,
        allow_missing_data_in_current: bool = False,
        allow_missing_data_in_previous: bool = False,
        as_warning: bool = False,
        compare_dir: Optional[str] = None,
    ) -> bool:
        """Replace subsequent :meth:`dump` calls with
        :meth:`compare_to_dumped_data` using these parameters (parity:
        ``tensor_dumper.py:307`` — same signature and semantics).

        ``compare_dir`` is an extension beyond the reference: compare against
        a DIFFERENT directory than ``dump_dir`` (the reference always
        compares against the enabled dump dir). A string first positional
        argument is accepted as ``compare_dir`` for back-compat with the
        round-1/2 API."""
        if isinstance(eps_numerical_data, str):  # legacy (compare_dir) call
            compare_dir = eps_numerical_data
            eps_numerical_data = 1e-6
        self._compare_dir = compare_dir or self._dump_dir
        self._dump_is_compare = True
        self._compare_params = dict(
            eps_numerical_data=eps_numerical_data,
            num_errors_per_tensor_to_show=num_errors_per_tensor_to_show,
            allow_missing_data_in_current=allow_missing_data_in_current,
            allow_missing_data_in_previous=allow_missing_data_in_previous,
            as_warning=as_warning,
        )
        return True

    def run_if_enabled(self, func: Callable[[], None]):
        """Run ``func`` only when enabled (keeps prep code zero-cost)."""
        if self._enabled:
            func()

    # ------------------------------------------------------------------ #
    # Ranges                                                             #
    # ------------------------------------------------------------------ #

    def push_range(self, range_name: Union[str, Callable[[], str]]):
        if not self._enabled:
            return
        if callable(range_name):
            range_name = range_name()
        self._range_stack.append(str(range_name))

    def pop_range(self):
        if not self._enabled:
            return
        assert self._range_stack, "pop_range without a matching push_range"
        self._range_stack.pop()

    def _full_path(self, path: str) -> str:
        return "/".join(self._range_stack + [path]) if self._range_stack else path

    # ------------------------------------------------------------------ #
    # Converters / options                                               #
    # ------------------------------------------------------------------ #

    def register_custom_converter(self, data_type: type, converter_func: Callable):
        """Convert instances of ``data_type`` before dumping
        (parity: ``tensor_dumper.py:593``)."""
        self._custom_converters[data_type] = converter_func

    def enable_ragged_batch_dumping(self, as_per_sample: bool = False):
        """Dump :class:`RaggedBatch` instances either as their
        (tensor, mask, sample_sizes) triple or as per-sample cropped arrays
        (parity: ``tensor_dumper.py:623``)."""
        self._ragged_enabled = True
        self._ragged_as_per_sample = as_per_sample

    # ------------------------------------------------------------------ #
    # Data collection                                                    #
    # ------------------------------------------------------------------ #

    def _convert_leaf(self, value):
        for t, conv in self._custom_converters.items():
            if isinstance(value, t):
                value = conv(value)
        # Late import to avoid a hard dependency.
        from ..ragged import RaggedBatch

        if isinstance(value, RaggedBatch):
            if not self._ragged_enabled:
                raise TypeError(
                    "RaggedBatch dumping is not enabled; call enable_ragged_batch_dumping()"
                )
            if self._ragged_as_per_sample:
                return {f"sample_{i}": _to_numpy(s) for i, s in enumerate(value.split())}
            return {
                "tensor": _to_numpy(value.tensor),
                "mask": _to_numpy(value.mask),
                "sample_sizes": _to_numpy(value.sample_sizes),
            }
        return value

    def _collect(
        self, path, data, dump_type, dump_type_override, permute_axes,
        permute_axes_override, exclude, into_grads,
    ):
        if callable(data) and not hasattr(data, "shape"):
            data = data()

        def recurse(node, full_path, name):
            if exclude and name in exclude:
                return
            node = self._convert_leaf(node)
            if isinstance(node, dict):
                for k, v in node.items():
                    recurse(v, f"{full_path}/{k}", k)
                return
            if isinstance(node, (list, tuple)) and not hasattr(node, "shape"):
                for i, v in enumerate(node):
                    recurse(v, f"{full_path}/{i}", str(i))
                return
            dt = dump_type
            if dump_type_override:
                for part in reversed(full_path.split("/")):
                    if part in dump_type_override:
                        dt = dump_type_override[part]
                        break
            perm = permute_axes
            if permute_axes_override:
                for part in reversed(full_path.split("/")):
                    if part in permute_axes_override:
                        perm = permute_axes_override[part]
                        break
            if node is None:
                arr = None
            else:
                arr = _to_numpy(node)
                if perm is not None:
                    arr = np.transpose(arr, perm)
            assert full_path not in self._data, f"Duplicate dump path: {full_path}"
            self._data[full_path] = arr
            self._entry_types[full_path] = dt
            if into_grads:
                self._grad_entries.append(full_path)
                self._pending_grad_paths.append(full_path)

        recurse(data, self._full_path(path), path.split("/")[-1])

    def add_tensor_data(
        self,
        path: str,
        data: Any,
        dump_type: "TensorDumper.Type",
        dump_type_override: Optional[dict] = None,
        permute_axes: Optional[Sequence[int]] = None,
        permute_axes_override: Optional[dict] = None,
        exclude: Optional[Sequence[str]] = None,
    ):
        """Add (nested) tensor data under ``path``
        (parity: ``tensor_dumper.py:342``)."""
        if not self._enabled:
            return
        self._collect(
            path, data, dump_type, dump_type_override, permute_axes,
            permute_axes_override, exclude, into_grads=False,
        )

    def add_grad_data(
        self,
        path: str,
        data: Any,
        dump_type: "TensorDumper.Type",
        dump_type_override: Optional[dict] = None,
        permute_grad_axes: Optional[Sequence[int]] = None,
        permute_grad_axes_override: Optional[dict] = None,
        exclude: Optional[Sequence[str]] = None,
    ):
        """Register tensors whose *gradients* will be supplied via
        :meth:`set_gradients` before the next :meth:`dump`
        (parity: ``tensor_dumper.py:384``; JAX-adapted, see module docstring).
        """
        if not self._enabled:
            return
        self._collect(
            f"grads/{path}", data, dump_type, dump_type_override,
            permute_grad_axes, permute_grad_axes_override, exclude, into_grads=True,
        )

    def set_gradients(self, gradients: Any):
        """Attach gradient values for tensors registered with
        :meth:`add_grad_data`, matched by registration order. ``gradients``
        may be a single array, a sequence, or a nested structure flattened in
        the same order (parity: ``tensor_dumper.py:517``)."""
        if not self._enabled:
            return
        import jax

        leaves = jax.tree_util.tree_leaves(gradients)
        assert len(leaves) == len(self._pending_grad_paths), (
            f"set_gradients got {len(leaves)} arrays for "
            f"{len(self._pending_grad_paths)} registered gradient entries"
        )
        for p, g in zip(self._pending_grad_paths, leaves):
            self._data[p] = _to_numpy(g) if g is not None else None
        self._pending_grad_paths = []

    def set_dump_type_for_all(
        self,
        dump_type: "TensorDumper.Type",
        include_tensors: bool = True,
        include_grads: bool = True,
    ):
        """Override the dump type of all already-added entries
        (parity: ``tensor_dumper.py:431``)."""
        if not self._enabled:
            return
        for p in self._entry_types:
            is_grad = p in self._grad_entries
            if (is_grad and include_grads) or (not is_grad and include_tensors):
                self._entry_types[p] = dump_type

    # ------------------------------------------------------------------ #
    # Dumping                                                            #
    # ------------------------------------------------------------------ #

    def _finish_iteration(self):
        """Shared epilogue of dump-mode and compare-mode iterations: bump the
        count, fire due after-count actions, clear collected data."""
        self._dump_count += 1
        for count, action in list(self._after_count_actions):
            if self._dump_count >= count:
                self._after_count_actions.remove((count, action))
                action()
        self._clear_iteration()

    def _clear_iteration(self):
        self._data = {}
        self._entry_types = {}
        self._grad_entries = []
        self._pending_grad_paths = []
        self._range_stack = []

    def _iter_json_path(self, count=None, base=None):
        base = base or self._dump_dir
        count = self._dump_count if count is None else count
        return os.path.join(base, f"dump_{count:06d}.json")

    def _side_file(self, json_name, path, ext):
        safe = path.replace("/", "_")
        return f"[{json_name}]{safe}.{ext}"

    def dump(self, dump_if_empty: bool = True):
        """Write the collected iteration data — or, after
        :meth:`set_dump_is_compare`, compare it against the reference dump
        instead (parity: ``tensor_dumper.py:452`` + ``:307``)."""
        if not self._enabled:
            return
        if not self._data and not dump_if_empty:
            return
        assert not self._pending_grad_paths, (
            "add_grad_data was called but set_gradients was not"
        )
        if self._dump_is_compare:
            # finally: a comparison mismatch raises (reference semantics),
            # but the iteration must still advance and clear — otherwise a
            # caller that catches the error to log-and-continue re-compares
            # the accumulated data against the SAME reference index forever
            try:
                self.compare_to_dumped_data(
                    compare_if_empty=dump_if_empty, **self._compare_params
                )
            finally:
                self._finish_iteration()
            return
        json_path = self._iter_json_path()
        json_name = os.path.basename(json_path)
        doc = {}
        for path, arr in self._data.items():
            dt = self._entry_types[path]
            if arr is None:
                doc[path] = None
                continue
            if dt == self.Type.JSON:
                doc[path] = {
                    "dtype": str(arr.dtype),
                    "shape": list(arr.shape),
                    "values": arr.tolist(),
                }
            elif dt == self.Type.BINARY:
                fn = self._side_file(json_name, path, "npy")
                np.save(os.path.join(self._dump_dir, fn), arr)
                with open(os.path.join(self._dump_dir, fn + ".meta.json"), "w") as f:
                    json.dump({"dtype": str(arr.dtype), "shape": list(arr.shape)}, f)
                doc[path] = {"file": fn}
            elif dt == self.Type.PICKLE:
                fn = self._side_file(json_name, path, "pkl")
                with open(os.path.join(self._dump_dir, fn), "wb") as f:
                    pickle.dump(arr, f)
                doc[path] = {"file": fn}
            elif self.Type.is_image(dt):
                fn = self._side_file(json_name, path, "png")
                self._write_image(os.path.join(self._dump_dir, fn), arr, dt)
                doc[path] = {"file": fn, "format": dt.name}
            else:  # pragma: no cover
                raise ValueError(f"Unknown dump type {dt}")
        with open(json_path, "w") as f:
            json.dump(doc, f, indent=1)
        self._finish_iteration()

    def _write_image(self, path, arr, dt):
        from PIL import Image

        amin, amax = float(np.nanmin(arr)), float(np.nanmax(arr))
        scale = 255.0 / (amax - amin) if amax > amin else 1.0
        img = ((arr - amin) * scale).astype(np.uint8)
        if dt == self.Type.IMAGE_BGR and img.ndim >= 3:
            img = img[..., ::-1]
        # extra leading dims iterate over images
        if (dt == self.Type.IMAGE_I and img.ndim > 2) or (
            dt != self.Type.IMAGE_I and img.ndim > 3
        ):
            lead = img.reshape((-1,) + img.shape[-(2 if dt == self.Type.IMAGE_I else 3):])
            for i, sub in enumerate(lead):
                Image.fromarray(sub).save(path.replace(".png", f".{i}.png"))
        else:
            Image.fromarray(img).save(path)
        with open(path + ".meta.json", "w") as f:
            json.dump({"min": amin, "max": amax, "format": dt.name}, f)

    # ------------------------------------------------------------------ #
    # Dump counting                                                      #
    # ------------------------------------------------------------------ #

    def reset_dump_count(self):
        self._dump_count = 0

    def set_dump_count(self, count: int):
        self._dump_count = count

    def get_dump_count(self) -> int:
        return self._dump_count

    def perform_after_dump_count(self, count: int, action: Callable[[], None]):
        """Run ``action`` once the dump count reaches ``count``
        (parity: ``tensor_dumper.py:565``)."""
        if not self._enabled:
            return
        self._after_count_actions.append((count, action))

    # ------------------------------------------------------------------ #
    # Comparison                                                         #
    # ------------------------------------------------------------------ #

    def _load_entry(self, base_dir, doc_entry):
        if doc_entry is None:
            return None
        if "values" in doc_entry:
            return np.asarray(doc_entry["values"], dtype=doc_entry["dtype"])
        fn = doc_entry["file"]
        if fn.endswith(".npy"):
            return np.load(os.path.join(base_dir, fn))
        if fn.endswith(".pkl"):
            with open(os.path.join(base_dir, fn), "rb") as f:
                return pickle.load(f)
        return None  # images are not numerically compared

    def compare_to_dumped_data(
        self,
        eps_numerical_data: float = 1e-6,
        num_errors_per_tensor_to_show: int = 1,
        allow_missing_data_in_current: bool = False,
        allow_missing_data_in_previous: bool = False,
        as_warning: bool = False,
        compare_if_empty: bool = True,
        dump_count: Optional[int] = None,
        raise_on_error: Optional[bool] = None,
    ) -> List[str]:
        """Diff the current iteration's data against the compare directory.

        Parity: ``tensor_dumper.py:467`` — same parameters and error
        behavior: a mismatch raises ``ValueError`` with the detailed message,
        or prints a warning instead when ``as_warning=True``. Additionally
        returns the list of error strings (empty = match).

        ``raise_on_error`` is the pre-parity keyword of this method's first
        two releases (mismatches returned as a list; raise only when
        ``True``): passing it — either value — selects that legacy contract
        so existing ``errors = td.compare_to_dumped_data()`` call sites keep
        their no-raise behavior by adding ``raise_on_error=False``.
        """
        if not self._enabled:
            return []
        if self._compare_dir is None:  # compare without prior set_dump_is_compare
            self._compare_dir = self._dump_dir
        if not self._data and not compare_if_empty:
            return []
        count = self._dump_count if dump_count is None else dump_count
        ref_json = self._iter_json_path(count, base=self._compare_dir)
        errors: List[str] = []
        if not os.path.exists(ref_json):
            errors.append(f"Reference dump not found: {ref_json}")
        else:
            with open(ref_json) as f:
                ref_doc = json.load(f)
            ref_keys = set(ref_doc)
            cur_keys = set(self._data)
            if not allow_missing_data_in_current:
                for missing in sorted(ref_keys - cur_keys):
                    errors.append(
                        f"'{missing}' present in reference but not in current dump"
                    )
            if not allow_missing_data_in_previous:
                for extra in sorted(cur_keys - ref_keys):
                    errors.append(
                        f"'{extra}' present in current dump but not in reference"
                    )
            for key in sorted(ref_keys & cur_keys):
                ref = self._load_entry(self._compare_dir, ref_doc[key])
                cur = self._data[key]
                if ref is None or cur is None:
                    if (ref is None) != (cur is None):
                        errors.append(f"'{key}': one side is null")
                    continue
                if tuple(ref.shape) != tuple(cur.shape):
                    errors.append(
                        f"'{key}': shape mismatch {tuple(cur.shape)} vs {tuple(ref.shape)}"
                    )
                    continue
                if ref.size == 0:
                    continue
                if np.issubdtype(ref.dtype, np.floating):
                    diff = np.abs(cur.astype(np.float64) - ref.astype(np.float64))
                    bad = np.argwhere(~(diff <= eps_numerical_data))
                else:
                    bad = np.argwhere(cur != ref)
                    diff = None
                if bad.size:
                    msgs = []
                    for idx in bad[:num_errors_per_tensor_to_show]:
                        t = tuple(int(i) for i in idx)
                        msgs.append(
                            f"at {t}: {cur[t]} vs {ref[t]}"
                            + (f" (|diff|={diff[t]:.3g})" if diff is not None else "")
                        )
                    errors.append(
                        f"'{key}': {len(bad)} mismatching elements, e.g. " + "; ".join(msgs)
                    )
        if errors:
            msg = "TensorDumper comparison failed:\n" + "\n".join(errors)
            if raise_on_error is not None:  # legacy contract (see docstring)
                if raise_on_error:
                    raise ValueError(msg)
            elif as_warning:
                import warnings

                warnings.warn(msg)
            else:
                raise ValueError(msg)
        return errors

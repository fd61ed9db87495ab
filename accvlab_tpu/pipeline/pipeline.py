"""PipelineDefinition + TPU pipeline executor.

TPU-native re-design of the reference
``dali_pipeline_framework/accvlab/dali_pipeline_framework/pipeline/pipeline.py:36-295``.
The DALI graph executor is replaced by:

* a **host stage**: parallel workers run the input callable and the
  host-placed steps per sample (numpy; JPEG decode etc. release the GIL),
* the **uniform boundary**: per-field per-sample arrays are stacked into
  batched numpy arrays (strings NUL-padded to the batch max, mirroring
  ``ensure_uniform_size_in_batch_for_all_strings``),
* one **device stage**: all device-placed steps fused into a single
  jit-compiled XLA program per batch shape — ``jit(vmap(compose(steps)))`` —
  executed asynchronously on the TPU,
* a **prefetch ring**: a background thread keeps ``prefetch_queue_depth``
  batches in flight, overlapping host work, H2D transfer, and device compute
  (the DALI prefetch-queue equivalent).

Construction-time blueprint checking is preserved 1:1
(``check_and_get_output_data_structure``). The DALI pass-through-copy
machinery (``_InsertCopyForPassthrough``) guards against DALI buffer aliasing;
XLA arrays are immutable so the corruption cannot occur — the parameters are
accepted for API parity and ignored.
"""

from __future__ import annotations

import os
import queue
import threading
import time
import warnings
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence, Union

import numpy as np

from .inputs.base import CallableBase, IterableBase, SampleInfo
from .processing_steps.pipeline_step_base import BatchLevelStepBase, PipelineStepBase
from .random_context import DeviceRandomContext, HostRandomContext
from .dtypes import DType
from .sample_data_group import SampleDataGroup


def _split_steps(steps: Sequence[PipelineStepBase]):
    """Partition steps into the host prefix and the fused device suffix."""
    host_steps: List[PipelineStepBase] = []
    device_steps: List[PipelineStepBase] = []
    in_device = False
    for s in steps:
        if s.placement == "device" or (in_device and s.placement == "any"):
            in_device = True
            device_steps.append(s)
        elif not in_device:
            host_steps.append(s)
        else:
            raise ValueError(
                f"Host-only step {type(s).__name__} cannot run after the "
                "host/device boundary (a device-placed step precedes it)."
            )
    return host_steps, device_steps


# Fused device programs are jitted through the process-global shared-
# program cache: structurally identical pipeline instances (checkpoint
# resume, preemption restart, elastic reshard) reuse one compiled
# executable instead of paying a full XLA compile per instance. See
# tools/program_cache.py for the design.
from ..tools.program_cache import program_cache_stats
from ..tools.program_cache import shared_jit as _shared_jit


class PipelineDefinition:
    """Composes an input source and processing steps into a TPU input pipeline.

    Parity with the reference constructor (``pipeline.py:45``); DALI-specific
    pass-through-copy arguments are accepted and ignored (see module
    docstring).
    """

    def __init__(
        self,
        data_loading_callable_iterable: Union[CallableBase, IterableBase],
        preprocess_functors: Optional[Sequence[Optional[PipelineStepBase]]] = None,
        check_data_format: bool = True,
        use_parallel_external_source: bool = True,
        prefetch_queue_depth: int = 2,
        print_sample_data_group_format: bool = False,
        copy_external_source_passthrough_outputs: Optional[bool] = None,
        passthrough_copy_field_names: Optional[Sequence] = None,
        passthrough_copy_field_names_scope_paths: Optional[Sequence] = None,
        passthrough_copy_branch_paths: Optional[Sequence] = None,
    ):
        self._input = data_loading_callable_iterable
        self._steps = [s for s in (preprocess_functors or []) if s is not None]
        self._check_data_format = check_data_format
        self._use_parallel = use_parallel_external_source
        self._prefetch_queue_depth = prefetch_queue_depth
        self._print_format = print_sample_data_group_format
        # XLA buffers are immutable; the DALI pass-through corruption cannot
        # occur, so no copies are ever needed.
        if copy_external_source_passthrough_outputs:
            warnings.warn(
                "copy_external_source_passthrough_outputs has no effect: XLA "
                "arrays are immutable, pass-through outputs cannot be corrupted."
            )

    @property
    def input_data_structure(self) -> SampleDataGroup:
        """Input format blueprint (from the data-loading functor)."""
        return self._input.used_sample_data_structure

    def check_and_get_output_data_structure(self) -> SampleDataGroup:
        """Infer the output format by folding every step's format check in
        the EXECUTOR'S order (parity: ``pipeline.py:150``): host per-sample
        steps, then host batch-level steps (the executor always hoists
        those to the end of the host stage), then the fused device steps —
        so a batch-level step that changes the field set (e.g. the wire
        packer) validates against what actually reaches it at runtime."""
        host_steps, device_steps = _split_steps(self._steps)
        ordered = (
            [s for s in host_steps if not s.is_batch_level]
            + [s for s in host_steps if s.is_batch_level]
            + list(device_steps)
        )
        blueprint = self.input_data_structure
        if self._print_format:
            print("### Input format:\n" + str(blueprint))
        for step in ordered:
            blueprint = step.check_input_data_format_and_set_output_data_format(blueprint)
            if self._print_format:
                print(f"### After {type(step).__name__}:\n" + str(blueprint))
        return blueprint

    def get_pipeline(
        self,
        batch_size: int,
        num_threads: int = 4,
        device=None,
        seed: int = 0,
        prefetch_queue_depth: Optional[int] = None,
        worker_mode: str = "thread",
        mesh=None,
        echo_factor: int = 1,
    ) -> "TPUPipeline":
        """Build the executable pipeline (parity: ``get_dali_pipeline``,
        ``pipeline.py:180``).

        ``worker_mode``: "thread" (default; host steps that release the GIL)
        or "process" (spawned workers, DALI parallel-external-source
        equivalent — requires the input callable and host steps to pickle).

        ``echo_factor``: data echoing (beyond reference parity; Choi et al.
        2019, "Faster Neural Network Training with Data Echoing"). Each host
        batch is delivered ``echo_factor`` times — transferred to the device
        ONCE, with a distinct device-side augmentation RNG stream per replay
        — multiplying delivered batches per epoch by the factor. Use when
        training is input-bound (host decode or host->device bandwidth is
        the gate and the accelerator idles): replays cost only device
        compute. Checkpoint/resume accounts echo sub-positions exactly.
        """
        return TPUPipeline(
            self,
            batch_size=batch_size,
            num_threads=num_threads,
            device=device,
            seed=seed,
            prefetch_queue_depth=(
                self._prefetch_queue_depth
                if prefetch_queue_depth is None
                else prefetch_queue_depth
            ),
            parallel=self._use_parallel,
            check_data_format=self._check_data_format,
            worker_mode=worker_mode,
            mesh=mesh,
            echo_factor=echo_factor,
        )

    # API-compat alias for call sites written against the reference name.
    get_dali_pipeline = get_pipeline


class TPUPipeline:
    """Executable input pipeline with prefetching. Yields name-keyed batches.

    Iteration protocol matches the DALI generic iterator: ``__next__`` returns
    ``[{flat_name: batched_array}]`` (device arrays), raises ``StopIteration``
    at epoch end; ``reset()`` starts the next epoch.
    """

    def __init__(
        self,
        definition: PipelineDefinition,
        batch_size: int,
        num_threads: int,
        device,
        seed: int,
        prefetch_queue_depth: int,
        parallel: bool,
        check_data_format: bool,
        worker_mode: str = "thread",
        mesh=None,
        echo_factor: int = 1,
    ):
        assert worker_mode in ("thread", "process")
        self._mesh = mesh  # optional jax.sharding.Mesh: shard batches over 'data'
        self._worker_mode = worker_mode
        self._num_threads = num_threads
        self._workers = None  # lazy ProcessSampleWorkers
        self._definition = definition
        self._batch_size = batch_size
        self._device = device
        self._seed = seed
        self._depth = max(1, prefetch_queue_depth)
        self._parallel = parallel
        self._check = check_data_format

        self._host_steps, self._device_steps = _split_steps(definition._steps)

        # Blueprint inference (construction time).
        self._input_blueprint = definition.input_data_structure
        bp = self._input_blueprint
        for s in self._host_steps:
            if not s.is_batch_level:
                bp = s.check_input_data_format_and_set_output_data_format(bp)
        # format after the PER-SAMPLE host phase: process workers return
        # samples in this shape (batch-level steps run in the producer
        # thread afterwards and may change the field set, e.g. the wire
        # packer)
        self._per_sample_out_blueprint = bp
        for s in self._host_steps:
            if s.is_batch_level:
                bp = s.check_input_data_format_and_set_output_data_format(bp)
        self._host_out_blueprint = bp
        for s in self._device_steps:
            bp = s.check_input_data_format_and_set_output_data_format(bp)
        self._output_blueprint = bp
        self._output_names = bp.field_names_flat

        # host-stage string fields need batch padding
        self._host_out_types = self._host_out_blueprint.field_types_flat

        self._pool = (
            ThreadPoolExecutor(max_workers=num_threads, thread_name_prefix="accvlab-host")
            if parallel
            else None
        )
        # built lazily (jit), keyed by (donate, batch shape signature)
        self._device_fns: dict = {}
        # abstract (shape, dtype, sharding) specs of the most recent
        # device-stage inputs — lets device_program_text() re-lower the
        # fused program on demand without holding any buffers alive
        self._last_device_spec = None
        # device_program_text() results keyed by (input specs, optimized):
        # each audit call would otherwise re-trace (and for optimized=True
        # re-compile) the whole fused program — seconds per call
        self._program_text_cache: dict = {}

        self._epoch = 0
        self._iteration = 0
        self._global_batch = 0

        # consumed position (checkpoint/resume): what the caller has actually
        # retrieved, as opposed to the producer counters above which run
        # ahead by the prefetch depth
        self._consumed_iteration = 0
        self._consumed_global = 0
        self._consumed_input_state = None
        self._input_state_captured = False
        # set_state arms this so that one iterator-front reset() (DALI
        # SimpleIterator resets on construction) does not discard the
        # restored position; cleared on first use
        self._resume_armed = False

        # data echoing (beyond reference parity; Choi et al. 2019): each
        # host batch is delivered echo_factor times, transferred ONCE, with
        # a distinct device-side augmentation RNG stream per replay — when
        # the pipeline is input-bound (host decode or host->device wire),
        # replays cost only device compute
        self._echo_factor = int(echo_factor)
        if self._echo_factor < 1:
            raise ValueError(f"echo_factor must be >= 1, got {echo_factor}")
        if self._echo_factor > 1 and not self._device_steps:
            warnings.warn(
                "echo_factor > 1 without any device-placed step replays "
                "identical batches (no augmentation to diversify them); "
                "example echoing still helps input-bound training but "
                "consider a device-side augmentation step."
            )
        self._echo_item = None  # ((idx, iter, state, transferred), next_echo)
        self._echo_start = 0  # first echo index of the next popped batch
        self._consumed_echo_next = 0

        self._queue: "queue.Queue" = queue.Queue(maxsize=self._depth)
        self._producer: Optional[threading.Thread] = None
        self._producer_stop = threading.Event()
        self._exhausted = False

        # observability counters (see stats()); written by one thread each
        self._stat_produced = 0
        self._stat_consumed = 0
        self._stat_producer_busy_s = 0.0
        self._stat_producer_blocked_s = 0.0
        self._stat_consumer_wait_s = 0.0
        self._stat_device_stage_s = 0.0
        self._stat_transfer_bytes = 0  # bytes of the last H2D transfer
        self._transfer_merge = None  # resolved on first transfer; may drop
        # to False if the backend rejects the byte-carve program
        self._last_dispatch_bytes = 0  # bytes the most recent dispatch moved
        # opt-in phase-timeline recording (see start_trace); when None the
        # hot paths pay one attribute read per phase
        self._trace = None

    # ------------------------------------------------------------------ #
    # Host stage                                                         #
    # ------------------------------------------------------------------ #

    _EPOCH_END = object()

    def _load_sample(self, idx_in_batch: int):
        info = SampleInfo(
            idx_in_epoch=self._iteration * self._batch_size + idx_in_batch,
            idx_in_batch=idx_in_batch,
            iteration=self._iteration,
            epoch_idx=self._epoch,
        )
        try:
            return self._definition._input(info)
        except StopIteration:
            # PEP 479: StopIteration cannot cross executor.map generators;
            # translate to a sentinel and re-raise after gathering.
            return self._EPOCH_END

    def _run_host_steps(self, flat: tuple, idx_in_batch: int) -> SampleDataGroup:
        sdg = self._input_blueprint.get_empty_like_self()
        sdg.set_data(list(flat))
        if self._host_steps:
            rng = HostRandomContext(
                np.random.default_rng(
                    (self._seed, self._epoch, self._iteration, idx_in_batch)
                )
            )
            for step in self._host_steps:
                if step.is_batch_level:
                    continue  # applied after the per-sample phase
                step.set_random_context(rng)
                sdg = step(sdg) if self._check else step._process(sdg)
        return sdg

    def _produce_host_batch(self):
        """Run input + host steps for one batch. Returns per-field stacked
        numpy arrays (or raises StopIteration at epoch end)."""
        is_callable = isinstance(self._definition._input, CallableBase)
        if is_callable and self._worker_mode == "process":
            from .worker_pool import ProcessSampleWorkers

            if self._workers is None:
                self._workers = ProcessSampleWorkers(
                    self._num_threads,
                    self._definition._input,
                    self._host_steps,
                    self._input_blueprint,
                    self._check,
                    self._seed,
                )
            flats = self._workers.produce_batch(
                self._batch_size, self._iteration, self._epoch
            )  # raises StopIteration at epoch end
            samples = []
            for flat in flats:
                # workers run the PER-SAMPLE host phase only; batch-level
                # steps (which may change the field set, e.g. the wire
                # packer) run below in the producer thread
                sdg = self._per_sample_out_blueprint.get_empty_like_self()
                sdg.set_data(flat)
                samples.append(sdg)
        elif is_callable:
            if self._parallel and self._pool is not None:
                # load + run host steps per sample fully inside the workers
                # (JPEG decode etc. release the GIL)
                def load_and_process(i):
                    flat = self._load_sample(i)
                    if flat is self._EPOCH_END:
                        return self._EPOCH_END
                    return self._run_host_steps(flat, i)

                samples = list(self._pool.map(load_and_process, range(self._batch_size)))
            else:
                samples = []
                for i in range(self._batch_size):
                    flat = self._load_sample(i)
                    samples.append(
                        flat if flat is self._EPOCH_END else self._run_host_steps(flat, i)
                    )
            if any(s is self._EPOCH_END for s in samples):
                raise StopIteration  # partial batches are dropped (DALI semantics)
        else:
            per_field = next(self._definition._input)  # may raise StopIteration
            batch_size = len(per_field[0])
            flats = [tuple(field[i] for field in per_field) for i in range(batch_size)]
            if self._parallel and self._pool is not None:
                samples = list(
                    self._pool.map(
                        lambda args: self._run_host_steps(*args),
                        [(f, i) for i, f in enumerate(flats)],
                    )
                )
            else:
                samples = [self._run_host_steps(f, i) for i, f in enumerate(flats)]

        # batch-level host steps
        for step in self._host_steps:
            if step.is_batch_level:
                assert isinstance(step, BatchLevelStepBase)
                samples = step.process_batch_checked(samples, self._check)

        self._iteration += 1
        self._global_batch += 1
        return (
            self._global_batch - 1,
            self._iteration,
            self._capture_input_state(),
            self._stack_samples(samples),
        )

    def _capture_input_state(self):
        """Snapshot the input's resume state (cheap counter dicts). ``None``
        for plain callable inputs (pure functions of SampleInfo — the
        pipeline counters alone resume them exactly) and for inputs that do
        not implement the protocol. Callables MAY expose ``get_state`` too
        (e.g. ``ElasticShardedInputCallable`` records its static resume
        offsets so chained reshards can account them)."""
        inp = self._definition._input
        if not hasattr(inp, "get_state"):
            return None
        try:
            return inp.get_state()
        except NotImplementedError:
            return None

    def _stack_samples(self, samples: List[SampleDataGroup]):
        names = self._host_out_blueprint.field_names_flat
        types = self._host_out_types
        per_sample_flat = [s.get_data() for s in samples]
        batched = []
        for fi, name in enumerate(names):
            vals = [np.asarray(ps[fi]) for ps in per_sample_flat]
            if types[fi] == DType.UINT8:
                # strings were declared STRING but flatten as UINT8; pad 1-D
                # uint8 fields of unequal length with NULs
                if any(v.ndim == 1 and v.dtype == np.uint8 for v in vals):
                    max_len = max(v.shape[0] if v.ndim == 1 else -1 for v in vals)
                    if any(v.ndim == 1 and v.shape[0] != max_len for v in vals):
                        vals = [
                            np.pad(v, (0, max_len - v.shape[0])) if v.ndim == 1 else v
                            for v in vals
                        ]
            shapes = {v.shape for v in vals}
            if len(shapes) > 1:
                raise ValueError(
                    f"Field '{name}' has non-uniform per-sample shapes {shapes} at "
                    "the host->device boundary. Add a padding step (e.g. "
                    "PaddingToUniform / ImageToTileSizePadder) before the first "
                    "device-placed step."
                )
            batched.append(np.stack(vals, axis=0))
        return tuple(batched)

    # ------------------------------------------------------------------ #
    # Device stage                                                       #
    # ------------------------------------------------------------------ #

    def _make_device_fn_all(self):
        """The traceable fused device stage: ``(flat_batch_leaves, key) ->
        flat_output_leaves`` — every device-placed step, vmapped over the
        batch. Shared by execution (:meth:`_build_device_fn`), program
        audit (:meth:`device_program_text`), and serving export
        (:meth:`export_device_program`)."""
        import jax

        host_bp = self._host_out_blueprint

        def sample_fn(leaves, key):
            sdg = host_bp.get_empty_like_self()
            sdg.set_data(list(leaves))
            ctx = DeviceRandomContext(key)
            for step in self._device_steps:
                step.set_random_context(ctx)
                # named_scope: step boundaries show up in jax.profiler device
                # traces and in the lowered HLO's op metadata — the fused
                # program's analog of per-operator NVTX ranges (SURVEY §5.1)
                with jax.named_scope(type(step).__name__):
                    sdg = step(sdg) if self._check else step._process(sdg)
            return tuple(sdg.get_data())

        def device_fn_all(batch_leaves, batch_key):
            keys = jax.random.split(batch_key, batch_leaves[0].shape[0])
            return jax.vmap(sample_fn)(batch_leaves, keys)

        return device_fn_all

    def _build_device_fn(self, example_batch, example_key, donate: bool = True):
        import jax

        device_fn_all = self._make_device_fn_all()

        # The freshly transferred batch buffers are never reused -> donate
        # them so in-place-capable ops skip the copy. Donation is per-
        # argument in jax, and some leaves are never reusable (e.g. the YUV
        # wire planes, consumed into a differently-shaped RGB image), which
        # would make XLA warn on every compile. Instead of suppressing the
        # warning (a process-global filter would also swallow the user's own
        # donation diagnostics elsewhere), donate precisely the leaves whose
        # (shape, dtype) has a matching output buffer: a cheap abstract
        # trace (eval_shape) gives the output spec, and the inputs split
        # into a donated tuple and a kept tuple. The multiset matching
        # mirrors XLA's own input-output aliasing rule, so the donation
        # warning only ever fires for a genuine, actionable reason. The
        # caller caches one built fn per batch shape signature, so varying
        # leaf shapes (string fields padded to a per-batch max) each get
        # their own correctly matched split.
        if not donate:  # echo replays reuse the transferred buffers
            return _shared_jit(device_fn_all, (example_batch, example_key))
        out_spec = jax.eval_shape(device_fn_all, example_batch, example_key)
        available: dict = {}
        for leaf in jax.tree_util.tree_leaves(out_spec):
            k = (tuple(leaf.shape), np.dtype(leaf.dtype))
            available[k] = available.get(k, 0) + 1
        donate_idx, keep_idx = [], []
        for i, leaf in enumerate(example_batch):
            k = (tuple(leaf.shape), np.dtype(leaf.dtype))
            if available.get(k, 0) > 0:
                available[k] -= 1
                donate_idx.append(i)
            else:
                keep_idx.append(i)
        donate_idx, keep_idx = tuple(donate_idx), tuple(keep_idx)
        n_leaves = len(example_batch)

        def device_fn(donated, kept, batch_key):
            leaves: list = [None] * n_leaves
            for j, i in enumerate(donate_idx):
                leaves[i] = donated[j]
            for j, i in enumerate(keep_idx):
                leaves[i] = kept[j]
            return device_fn_all(tuple(leaves), batch_key)

        donated_ex = tuple(example_batch[i] for i in donate_idx)
        kept_ex = tuple(example_batch[i] for i in keep_idx)
        fn = _shared_jit(
            device_fn, (donated_ex, kept_ex, example_key), donate_argnums=(0,)
        )

        def run(batch_leaves, batch_key):
            donated = tuple(batch_leaves[i] for i in donate_idx)
            kept = tuple(batch_leaves[i] for i in keep_idx)
            return fn(donated, kept, batch_key)

        return run

    def _transfer(self, host_batch: tuple):
        """Host->device placement: packed multi-tensor transfer (hostcopy
        engine) on a single device, or data-axis sharded placement when a
        mesh is configured."""
        import jax

        # observability: actual bytes crossing the host->device wire per
        # batch (reflects the wire format incl. compression — see stats())
        self._stat_transfer_bytes = sum(
            a.nbytes for a in host_batch if hasattr(a, "nbytes")
        )

        if self._mesh is not None:
            from ..parallel import shard_batch

            return tuple(shard_batch(list(host_batch), self._mesh))
        from ..hostcopy import start_copy

        # Pack EVERY field into per-dtype chunks (not just the <=256 KB
        # candidates): the batch then costs one transfer per chunk plus a
        # single view-carving dispatch. Measured on-TPU 2026-08-20 (dct-dp16
        # wire, docs/bench_watch_r05.jsonl): the per-field plan issued 34
        # device_puts + 4 slicer dispatches per batch — ~750 ms of fixed
        # per-round-trip cost on the remote-attach tunnel, dwarfing the
        # 5.4 MB payload. The extra cost of packing large fields is one
        # parallel memcpy (csrc/pack.cpp, GIL-free, ~GB/s). Env override
        # ACCVLAB_TRANSFER_PACK_MAX (bytes; 0 = reference per-field plan).
        pack_max = int(os.environ.get("ACCVLAB_TRANSFER_PACK_MAX", str(32 << 20)))
        if self._transfer_merge is None:
            self._transfer_merge = bool(pack_max) and os.environ.get(
                "ACCVLAB_TRANSFER_MERGE", "1"
            ) != "0"
        try:
            handle = start_copy(
                list(host_batch), device=self._device, use_background_thread=False,
                pack_candidate_max_bytes=pack_max or None,
                # single raw-byte chunk + device-side re-typing: ONE transfer
                # + ONE dispatch per batch (env opt-out for A/B)
                merge_dtype_chunks=self._transfer_merge,
            )
            return tuple(handle.get())
        except Exception:
            if not self._transfer_merge:
                raise
            # insurance for backends whose lowering rejects the byte-carve
            # program (e.g. a bitcast gap): drop to per-dtype chunks for the
            # pipeline's lifetime rather than dying on the first batch —
            # costs a few extra dispatches, never correctness
            warnings.warn(
                "merged byte-chunk transfer failed on this backend; "
                "falling back to per-dtype chunks",
                RuntimeWarning,
            )
            self._transfer_merge = False
            handle = start_copy(
                list(host_batch), device=self._device, use_background_thread=False,
                pack_candidate_max_bytes=pack_max or None,
                merge_dtype_chunks=False,
            )
            return tuple(handle.get())

    def _run_device_stage(self, host_batch: tuple, batch_idx: int, echo_i: int = 0):
        """One device pass over a (possibly already-transferred) batch.
        Returns ``(outputs, transferred_batch)`` so echo replays reuse the
        device-resident buffers without a second host->device transfer."""
        import jax

        transferred = isinstance(host_batch[0], np.ndarray)
        if transferred:
            host_batch = self._transfer(host_batch)
        # bytes this dispatch actually moved host->device: echo replays
        # reuse device-resident buffers and move nothing (the trace must
        # not overstate wire traffic by echo_factor)
        self._last_dispatch_bytes = self._stat_transfer_bytes if transferred else 0
        if not self._device_steps:
            return host_batch, host_batch
        # the key derives from the batch's own index (carried through the
        # prefetch queue), NOT the producer's live counter — deterministic
        # regardless of prefetch timing. Echo replays fold the echo index on
        # top, giving each replay its own augmentation stream (the echo_factor
        # == 1 derivation is unchanged for bit-compat with existing runs).
        key = jax.random.fold_in(jax.random.PRNGKey(self._seed), batch_idx)
        if self._echo_factor > 1:
            key = jax.random.fold_in(key, echo_i)
        # Donation consumes the input buffers, so with echo replays the
        # transferred batch must stay alive until the LAST replay — which
        # can and does donate (the buffers are dead afterwards). Two jitted
        # variants, built lazily (both on the first host batch); on
        # slow-compile paths the persistent compilation cache absorbs the
        # second compile across runs.
        donate = echo_i == self._echo_factor - 1
        # keyed by the batch's (shape, dtype) signature, not just the donate
        # flag: the donated/kept leaf split is computed from the traced
        # output spec, and a pipeline whose leaf shapes vary across batches
        # (e.g. string fields padded to a per-batch max) needs a correctly
        # matched split per shape family — reusing the first batch's split
        # would silently drop donation and warn on every retrace (ADVICE r3)
        sig = (donate,) + tuple(
            (tuple(leaf.shape), str(leaf.dtype)) for leaf in host_batch
        )
        if self._device_fns.get(sig) is None:
            self._device_fns[sig] = self._build_device_fn(
                host_batch, key, donate=donate
            )
        # carry each leaf's sharding so device_program_text() lowers the
        # program that actually executes (on mesh pipelines the SPMD
        # partitioning changes fusion/layout; an unsharded re-lower would
        # audit a different program)
        self._last_device_spec = (
            tuple(
                jax.ShapeDtypeStruct(
                    tuple(leaf.shape), leaf.dtype,
                    sharding=getattr(leaf, "sharding", None),
                )
                for leaf in host_batch
            ),
            jax.ShapeDtypeStruct(
                tuple(key.shape), key.dtype,
                sharding=getattr(key, "sharding", None),
            ),
        )
        fn = self._device_fns[sig]
        if self._mesh is not None:
            with self._mesh:
                return fn(host_batch, key), host_batch
        return fn(host_batch, key), host_batch

    # ------------------------------------------------------------------ #
    # Prefetching iterator protocol                                      #
    # ------------------------------------------------------------------ #

    _END = object()

    def _producer_loop(self):
        # The producer performs ONLY host-stage work; transfer + device
        # dispatch happen on the consumer thread (__next__). Device dispatch
        # is asynchronous (~1 ms), so host production of batch N+1 still
        # overlaps device compute of batch N — but all runtime-client calls
        # stay on one thread, avoiding GIL/client lock convoys between the
        # producer, the decode pool, and the main thread (measured: the
        # convoy collapses throughput ~8x when service RPC latency rises).
        while not self._producer_stop.is_set():
            t0 = time.monotonic()
            try:
                item = self._produce_host_batch()
            except StopIteration:
                self._queue.put(self._END)
                return
            except Exception as e:  # propagate to the consumer — the
                # consumer must never block forever
                self._queue.put(e)
                return
            t1 = time.monotonic()
            self._queue.put(item)
            t2 = time.monotonic()
            self._stat_producer_busy_s += t1 - t0
            self._stat_producer_blocked_s += t2 - t1
            self._stat_produced += 1
            tr = self._trace
            if tr is not None:
                tr.complete("host_build", "producer", t0, t1 - t0, batch=item[0])
                tr.complete("queue_put", "producer", t1, t2 - t1, batch=item[0])

    def _ensure_producer(self):
        # spawn only when no producer exists for this run (reset()/set_state
        # clear it via _halt_producer). A producer that already RAN and died
        # has delivered its terminal item (_END / Exception) into the queue —
        # respawning it at epoch end would enqueue redundant sentinels and,
        # for auto-resetting iterable inputs, silently consume (then discard)
        # the next epoch's first batch.
        if self._producer is None:
            if not self._exhausted:
                # iteration is starting: a later reset() is a genuine epoch
                # boundary again, not the iterator-front reset after resume
                self._resume_armed = False
                # capture the input's at-rest state BEFORE the producer can
                # advance it: until the first batch of this run is consumed,
                # this is the position get_state() must report
                if not self._input_state_captured:
                    self._consumed_input_state = self._capture_input_state()
                    self._input_state_captured = True
                self._producer_stop.clear()
                self._producer = threading.Thread(
                    target=self._producer_loop, daemon=True, name="accvlab-prefetch"
                )
                self._producer.start()

    def __iter__(self):
        return self

    def __next__(self):
        if self._exhausted:
            raise StopIteration
        if self._echo_item is None:
            self._ensure_producer()
            t_wait0 = time.monotonic()
            while True:
                try:
                    item = self._queue.get(timeout=5.0)
                    break
                except queue.Empty:
                    # defense in depth: if the producer thread died without
                    # delivering (it shouldn't — all failure paths enqueue),
                    # fail loudly instead of blocking forever
                    if self._producer is None or not self._producer.is_alive():
                        self._exhausted = True
                        raise RuntimeError(
                            "pipeline producer thread died without delivering "
                            "a batch or an error"
                        )
            if item is self._END:
                self._exhausted = True
                tr = self._trace  # snapshot: stop_trace may race from a
                if tr is not None:  # monitoring thread
                    tr.instant("epoch_end", "consumer", epoch=self._epoch)
                raise StopIteration
            if isinstance(item, Exception):
                self._exhausted = True
                raise item
            t_wait1 = time.monotonic()
            self._stat_consumer_wait_s += t_wait1 - t_wait0
            tr = self._trace
            if tr is not None:
                tr.complete(
                    "consumer_wait", "consumer", t_wait0, t_wait1 - t_wait0,
                    batch=item[0],
                )
            # start this host batch at echo 0, or mid-echo after a resume
            self._echo_item = (item, self._echo_start)
            self._echo_start = 0
        (batch_idx, iter_after, input_state_after, host_batch), echo_i = self._echo_item
        t_dev0 = time.monotonic()
        try:
            out, host_batch = self._run_device_stage(host_batch, batch_idx, echo_i)
        except Exception:
            self._exhausted = True
            self._echo_item = None
            raise
        t_dev1 = time.monotonic()
        self._stat_device_stage_s += t_dev1 - t_dev0
        self._stat_consumed += 1
        tr = self._trace
        if tr is not None:
            tr.complete(
                "device_dispatch", "consumer", t_dev0, t_dev1 - t_dev0,
                batch=batch_idx, echo=echo_i, bytes=self._last_dispatch_bytes,
            )
        # batch delivered: advance the consumed position (resume point)
        if echo_i + 1 < self._echo_factor:
            # keep the (now device-resident) host batch for its next echo
            self._echo_item = (
                (batch_idx, iter_after, input_state_after, host_batch),
                echo_i + 1,
            )
            self._consumed_global = batch_idx
            self._consumed_echo_next = echo_i + 1
        else:
            self._echo_item = None
            self._consumed_global = batch_idx + 1
            self._consumed_echo_next = 0
            self._consumed_iteration = iter_after
            self._consumed_input_state = input_state_after
        return [dict(zip(self._output_names, out))]

    def run(self):
        """Fetch one batch as a name-keyed dict (convenience around __next__)."""
        return self.__next__()[0]

    def _halt_producer(self):
        """Stop + join the producer thread and discard any prefetched
        batches; leaves the queue fresh.

        Waits until the thread actually exits (draining the queue so a
        blocked ``put`` can finish): proceeding while the old producer is
        still mid-batch would let it overwrite counters restored by
        ``set_state``, advance the stateful input past the restored
        position, and race the replacement producer on ``next(input)`` —
        silently breaking the bit-identical resume guarantee. The producer
        can only be between two states — inside finite host work, or
        blocked on queue space (which the drain releases) — so this loop
        terminates once the in-flight batch completes."""
        self._producer_stop.set()
        t = self._producer
        if t is not None and t.is_alive():
            # Bounded: an input callable stuck in external I/O (this repo
            # documents multi-hour remote-tunnel wedges) must not turn
            # reset()/set_state() into an unbounded hang. Within the bound we
            # DO wait — proceeding while the old producer is mid-batch breaks
            # the bit-identical resume guarantee (it would overwrite restored
            # counters and race the replacement producer on next(input)).
            bound = float(os.environ.get("ACCVLAB_HALT_TIMEOUT_S", "60"))
            t0 = time.monotonic()
            warn_at = t0 + 15.0
            while t.is_alive():
                try:
                    while True:
                        self._queue.get_nowait()
                except queue.Empty:
                    pass
                t.join(timeout=0.25)
                now = time.monotonic()
                if t.is_alive() and now >= warn_at:
                    warnings.warn(
                        "pipeline producer is still finishing its in-flight "
                        "host batch; waiting for it to stop cleanly"
                    )
                    warn_at = float("inf")
                if t.is_alive() and now - t0 >= bound:
                    raise RuntimeError(
                        f"pipeline producer did not stop within "
                        f"{bound:.0f}s (ACCVLAB_HALT_TIMEOUT_S) — the input "
                        "callable appears stuck in external I/O. The "
                        "pipeline state is NOT safe for an exact resume; "
                        "fix or time-box the input, or raise the bound."
                    )
        self._queue = queue.Queue(maxsize=self._depth)
        self._producer = None
        # in-progress echo replays are prefetched state too: discard
        self._echo_item = None
        self._echo_start = 0
        self._consumed_echo_next = 0

    def _reset_from_iterator_front(self):
        """Reset issued by an iterator front on construction
        (``StructuredOutputIterator.SimpleIterator.__init__``).

        The first such reset after :meth:`set_state` is a no-op: iterator
        fronts reset on construction (DALI parity), which would otherwise
        bump the epoch and discard the just-restored position before a
        single batch of the resumed run was consumed. Only THIS construction
        path consumes the armed flag — a user-initiated :meth:`reset` after
        ``set_state`` is a genuine epoch restart and always executes."""
        if self._resume_armed:
            self._resume_armed = False
            return
        self.reset()

    def reset(self):
        """Start the next epoch (parity with DALI iterator reset).

        Always a real reset: a reset issued after :meth:`set_state` restarts
        the epoch (discarding the restored position). The one automatic
        reset that iterator fronts issue on construction goes through
        :meth:`_reset_from_iterator_front` instead, which is the only path
        the post-``set_state`` no-op applies to.

        A MID-epoch reset behaves, for the augmentation key stream, as if
        the abandoned epoch had been consumed to its end: the key counter
        rolls forward to the epoch boundary (when the input advertises its
        epoch length), so the next epoch's batches are bit-identical to an
        uninterrupted run's — NOT dependent on how far the prefetch
        producer happened to run ahead at reset time. Inputs with unknown
        length keep the producer's (timing-dependent) counter; their
        post-reset streams are unique-keyed but not reproducible."""
        self._resume_armed = False
        # a partially-echoed batch means this epoch HAS delivered output even
        # when _iteration is still 0 (echo counters advance before the host
        # batch completes) — snapshot before _halt_producer clears them, so
        # the epoch-advance check below sees it (e.g. reset() right after
        # restoring a mid-echo checkpoint of an epoch's first batch)
        mid_echo = self._consumed_echo_next > 0 or self._echo_start > 0
        self._halt_producer()
        tr = self._trace  # snapshot: stop_trace may race from another thread
        if tr is not None:
            tr.instant("reset", "consumer", epoch=self._epoch)
        if self._exhausted or self._iteration > 0 or mid_echo:
            # deterministic key-stream rollover: _global_batch - _iteration
            # is the epoch's first host-batch index (stable — the producer
            # run-ahead cancels), so epoch_start + steps is the counter an
            # uninterrupted epoch would have ended with. Monotone: the
            # producer can never have produced past the epoch end, so this
            # only moves forward and never reuses a delivered batch's key.
            steps = self._epoch_steps_hint(self._epoch)
            if steps is not None:
                # monotonicity guard: if a static `length` hint underestimates
                # this epoch's true step count (variable-epoch-length
                # samplers), never move the counter backward past batches the
                # producer already keyed
                steps = max(int(steps), self._iteration)
                self._global_batch = (
                    self._global_batch - self._iteration + steps
                )
            self._epoch += 1
        self._iteration = 0
        self._exhausted = False
        # prefetched-but-unconsumed batches were dropped above; the producer
        # counters (incl. any stateful input's position) stand wherever
        # production got to, so the consumed position re-syncs to them and
        # the input state is re-captured at the next producer start
        self._consumed_iteration = 0
        self._consumed_global = self._global_batch
        self._input_state_captured = False

    def _epoch_steps_hint(self, epoch_idx: int) -> Optional[int]:
        """Host batches the input delivers in ``epoch_idx``, if knowable:
        ``steps_in_epoch(epoch)`` (exact, offset-aware — e.g.
        ``ElasticShardedInputCallable``) over the static ``length``
        property; ``None`` for unbounded/unsized inputs."""
        inp = self._definition._input
        f = getattr(inp, "steps_in_epoch", None)
        if callable(f):
            try:
                return int(f(epoch_idx))
            except Exception:
                return None
        n = getattr(inp, "length", None)
        return None if n is None else int(n)

    # ------------------------------------------------------------------ #
    # Checkpoint / resume                                                #
    # ------------------------------------------------------------------ #

    def get_state(self) -> dict:
        """JSON-serializable snapshot of the *consumed* pipeline position.

        Put the dict into the training checkpoint next to the model state;
        after a preemption, rebuild the pipeline (same constructor arguments,
        same input object in its initial state) and call :meth:`set_state`
        before the first ``__next__`` — the stream of batches then continues
        bit-identically (host/device augmentation RNG included) from the
        first batch the interrupted run never consumed. Prefetched-but-
        unconsumed batches are re-produced, not skipped.

        Beyond reference parity: the reference input framework has no resume
        API (SURVEY §5.4); on preemptible TPU fleets this is the difference
        between exact data accounting and silently repeating/skipping
        samples after every preemption.
        """
        if not self._input_state_captured:
            self._consumed_input_state = self._capture_input_state()
            self._input_state_captured = True
        state = {
            "version": 1,
            "epoch": self._epoch,
            "iteration": self._consumed_iteration,
            "global_batch": self._consumed_global,
            "input_state": self._consumed_input_state,
        }
        if self._echo_factor > 1:
            # mid-echo position: global_batch points at the host batch to
            # re-produce; 'next' is the first undelivered replay of it
            state["echo"] = {
                "factor": self._echo_factor,
                "next": self._consumed_echo_next,
            }
        return state

    def set_state(self, state: dict):
        """Restore a position captured by :meth:`get_state` (stops any
        running producer; prefetched batches are discarded)."""
        if state.get("version") != 1:
            raise ValueError(f"Unknown pipeline state version: {state.get('version')!r}")
        echo = state.get("echo")
        state_factor = 1 if echo is None else int(echo["factor"])
        if state_factor != self._echo_factor:
            raise ValueError(
                f"Checkpoint was taken with echo_factor={state_factor}; this "
                f"pipeline has echo_factor={self._echo_factor} — the delivered "
                "batch streams would diverge. Rebuild with the matching factor."
            )
        self._halt_producer()
        self._echo_start = 0 if echo is None else int(echo["next"])
        self._consumed_echo_next = self._echo_start
        self._epoch = int(state["epoch"])
        self._iteration = int(state["iteration"])
        self._global_batch = int(state["global_batch"])
        self._consumed_iteration = self._iteration
        self._consumed_global = self._global_batch
        self._exhausted = False
        input_state = state.get("input_state")
        if input_state is not None:
            # inputs may expose get_state without set_state (a snapshot of
            # STATIC resume parameters, e.g. ElasticShardedInputCallable
            # implements both, with set_state a documented no-op); a
            # STATEFUL input lacking set_state cannot be restored — warn
            # like the stateless-iterable branch below does
            if hasattr(self._definition._input, "set_state"):
                self._definition._input.set_state(input_state)
            else:
                warnings.warn(
                    "The checkpoint carries an input state (the input "
                    "implements get_state) but the input has no set_state — "
                    "the recorded position cannot be restored and the input "
                    "continues from its current (fresh-constructed) "
                    "position. Implement set_state, or carry the position "
                    "through constructor arguments as "
                    "ElasticShardedInputCallable does."
                )
        elif isinstance(self._definition._input, IterableBase):
            warnings.warn(
                "Resuming a pipeline over an iterable input without a saved "
                "input state: the pipeline counters are restored, but the "
                "iterable continues from its current position — exact resume "
                "is only guaranteed for stateless inputs or iterables "
                "implementing get_state/set_state."
            )
        self._consumed_input_state = input_state
        # input_state None means "the restored state carries no input
        # snapshot" (e.g. elastic_reshard moved the position into the new
        # input's constructor arguments): re-capture from the ACTUAL input at
        # first use so a checkpoint taken before the first consumed batch
        # still records the true offsets — without this, a chained reshard
        # from such a checkpoint would restart the epoch at offset 0
        self._input_state_captured = input_state is not None
        # the next reset() (an iterator front constructing its epoch view)
        # must not discard this restored position — see reset()
        self._resume_armed = True

    @property
    def length(self) -> Optional[int]:
        """Batches this pipeline delivers per (full) epoch, when the input
        advertises its length: input batches times ``echo_factor``.
        ``None`` for unbounded/unknown inputs. Sizing information for
        progress bars / schedulers; the authoritative epoch end is still
        ``StopIteration``."""
        n = getattr(self._definition._input, "length", None)
        return None if n is None else int(n) * self._echo_factor

    def stats(self) -> dict:
        """Live throughput/occupancy counters — the in-process
        "am I input-bound?" signal (complements the decoder-cache
        observability; reference's equivalent is external nsys traces,
        SURVEY §5.1/§5.5).

        Returns a dict of monotonically growing counters:

        * ``produced`` / ``consumed`` — host batches built vs batches
          delivered (with ``echo_factor`` E, consumed grows E per host
          batch).
        * ``producer_busy_s`` — wall time the producer spent building host
          batches (input callable + host steps + stacking).
        * ``producer_blocked_s`` — time the producer waited for queue space
          (large ⇒ the consumer/device is the bottleneck).
        * ``consumer_wait_s`` — time ``__next__`` waited for a host batch
          (large ⇒ the host input stage is the bottleneck: add workers, use
          ``worker_mode="process"``, or cut per-sample host work).
        * ``device_stage_s`` — time in H2D transfer + device dispatch.
          Dispatch is asynchronous, so this is the *synchronous cost* of the
          device stage (transfer + trace/cache lookup), not device compute.
        * ``queue_depth`` / ``queue_size`` — prefetch ring capacity and its
          current occupancy (persistently 0 ⇒ input-bound, persistently
          full ⇒ device-bound).
        * ``bytes_per_batch`` — actual bytes of the most recent
          host->device transfer (reflects the configured wire format,
          including :class:`WirePlanePacker` compression).
        * ``input_bound_frac`` — ``consumer_wait_s`` as a fraction of
          consumer wall time (wait + device stage); ~0 means the prefetch
          ring fully hides host work, ~1 means the device starves.
        * ``program_cache`` — the process-global shared-program cache's
          ``{hits, misses, declined, size}`` (``tools.program_cache_stats``;
          global, not per-pipeline — a resumed/re-created pipeline should
          show its fused program landing as a hit).

        Each counter is written by exactly one thread (producer or
        consumer) and read racily here — values are monotone and
        self-consistent enough for monitoring; do not diff across threads
        at microsecond resolution.
        """
        wait = self._stat_consumer_wait_s
        dev = self._stat_device_stage_s
        denom = wait + dev
        return {
            "produced": self._stat_produced,
            "consumed": self._stat_consumed,
            "producer_busy_s": self._stat_producer_busy_s,
            "producer_blocked_s": self._stat_producer_blocked_s,
            "consumer_wait_s": wait,
            "device_stage_s": dev,
            "queue_depth": self._depth,
            "queue_size": self._queue.qsize(),
            "bytes_per_batch": self._stat_transfer_bytes,
            "input_bound_frac": (wait / denom) if denom > 0.0 else 0.0,
            "program_cache": program_cache_stats(),
        }

    def device_program_text(self, optimized: bool = False) -> str:
        """Text of the ONE fused device program (the jit of all
        device-placed steps, vmapped over the batch) for the most recent
        batch shape — the device-stage analog of the reference's pipeline
        graph printing (``print_sample_data_group_format`` /
        ``print_tensor_op``, dali ``pipeline.py:196-209``), and the static
        complement of :meth:`start_trace`'s runtime timeline.

        ``optimized=False`` (default) returns the lowered StableHLO with
        debug info — each op's metadata carries the ``jax.named_scope``
        of the step that produced it, so the program is auditable
        step-by-step. ``optimized=True`` returns the backend-compiled HLO
        (post-fusion), showing what will actually execute.

        Inspection-only guards this enables (see the suite): no host
        callbacks inside the device program, no accidental float64, every
        step present. Requires at least one delivered batch (the program
        is built lazily per batch shape); raises ``RuntimeError`` before
        that or when the pipeline has no device-placed steps.
        """
        import jax

        if not self._device_steps:
            raise RuntimeError(
                "this pipeline has no device-placed steps (no fused device "
                "program exists)"
            )
        if self._last_device_spec is None:
            raise RuntimeError(
                "no device program built yet — deliver at least one batch "
                "(pipe.run()) first"
            )
        batch_spec, key_spec = self._last_device_spec
        cache_key = (
            tuple(
                (s.shape, str(s.dtype), str(s.sharding))
                for s in batch_spec + (key_spec,)
            ),
            bool(optimized),
        )
        cached = self._program_text_cache.get(cache_key)
        if cached is not None:
            return cached
        # donate=False variant: identical program modulo buffer donation,
        # and its jit exposes .lower() directly
        fn = self._build_device_fn(batch_spec, key_spec, donate=False)
        if self._mesh is not None:
            with self._mesh:
                lowered = fn.lower(batch_spec, key_spec)
        else:
            lowered = fn.lower(batch_spec, key_spec)
        if optimized:
            text = lowered.compile().as_text()
        else:
            text = lowered.as_text(debug_info=True)
        self._program_text_cache[cache_key] = text
        return text

    def export_device_program(self, path: Optional[str] = None):
        """Export the fused device program as a self-contained serving
        artifact (the ``models/serving.py`` container: versioned header +
        serialized StableHLO).

        Serving usually re-implements preprocessing and drifts from
        training; this ships the EXACT program the training pipeline ran —
        every device-placed step, vmapped over the batch — so a serving
        host reproduces the training-time preprocessing bit-for-bit with
        ``accvlab_tpu.models.serving.load_inference`` and NO pipeline code::

            serve = load_inference("preprocess.accvserve")
            out_leaves = serve(host_batch_leaves, rng_key)

        The artifact's calling convention is the device stage's own:
        a tuple of flat host-stage output leaves (header field
        ``pipeline_input_fields`` names them in order) plus the batch PRNG
        key (deterministic eval pipelines ignore it — pass any key);
        outputs are the flat final leaves (``pipeline_output_fields``).
        Shapes are those of the most recent delivered batch; like
        :meth:`device_program_text` this requires one delivered batch and
        at least one device-placed step. Mesh pipelines export the SPMD
        program (load with ``mesh=``).

        Returns the artifact header dict; the bytes go to ``path`` (atomic
        write) when given, else they are returned instead of the header.
        """
        import jax
        from jax import export as jexport

        # the artifact container lives with the model-serving exporter —
        # a lazy import (models resolves submodules lazily, so this pulls
        # neither flax nor the model zoo into pipeline users)
        from ..models import serving as _serving

        if not self._device_steps:
            raise RuntimeError(
                "this pipeline has no device-placed steps (no fused device "
                "program exists)"
            )
        if self._last_device_spec is None:
            raise RuntimeError(
                "no device program built yet — deliver at least one batch "
                "(pipe.run()) first"
            )
        batch_spec, key_spec = self._last_device_spec
        jitted = jax.jit(self._make_device_fn_all())
        if self._mesh is not None:
            with self._mesh:
                exported = jexport.export(jitted)(batch_spec, key_spec)
        else:
            exported = jexport.export(jitted)(batch_spec, key_spec)
        header = _serving._header(exported, batch_polymorphic=False)
        header["pipeline_input_fields"] = list(
            self._host_out_blueprint.field_names_flat
        )
        header["pipeline_output_fields"] = list(
            self._per_sample_out_blueprint.field_names_flat
        )
        data = _serving._pack(header, exported.serialize())
        if path is None:
            return data
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return header

    def start_trace(self, max_events: int = 100_000):
        """Start recording the pipeline's phase timeline (producer
        ``host_build``/``queue_put``, consumer ``consumer_wait``/
        ``device_dispatch``, ``epoch_end``/``reset`` instants) into a
        :class:`~accvlab_tpu.tools.chrome_trace.ChromeTraceRecorder`.

        Returns the recorder (also handed back by :meth:`stop_trace`).
        Where ``stats()`` aggregates, the trace shows each batch's spans on
        a shared clock — open the saved file in chrome://tracing /
        Perfetto to see wait gaps and their alignment. Device-internal op
        timing still belongs to ``jax.profiler``; this is the host-side
        orchestration view (SURVEY §5.1 — the reference's analog is an
        external nsys timeline of its NVTX ranges).
        """
        if self._trace is not None:
            raise RuntimeError(
                "a pipeline trace is already active (stop_trace() first)"
            )
        from ..tools.chrome_trace import ChromeTraceRecorder

        trace = ChromeTraceRecorder(max_events=max_events)
        self._trace = trace
        return trace

    def stop_trace(self, path: Optional[str] = None):
        """Stop recording; optionally save to ``path`` (Chrome trace JSON).
        Returns the recorder. A producer span already in flight may still
        append to the returned recorder moments after this call — after the
        ``path`` snapshot was written — so for the complete picture call
        ``trace.save(path)`` yourself once the pipeline is quiescent (after
        ``stop()`` or an epoch end). A later :meth:`start_trace` gets a
        fresh recorder, so traces never mix."""
        trace = self._trace
        if trace is None:
            raise RuntimeError("no active pipeline trace (start_trace() first)")
        self._trace = None
        if path is not None:
            trace.save(path)
        return trace

    def stop(self):
        """Shut down the producer thread and worker pool."""
        self._producer_stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        if self._producer is not None and self._producer.is_alive():
            self._producer.join(timeout=5.0)
        if self._pool is not None:
            self._pool.shutdown(wait=False)
        if self._workers is not None:
            self._workers.shutdown()
            self._workers = None

    @property
    def output_blueprint(self) -> SampleDataGroup:
        return self._output_blueprint.get_empty_like_self()

    @property
    def output_names(self):
        return self._output_names

"""Pipeline phase-timeline tracing (TPUPipeline.start_trace/stop_trace +
ChromeTraceRecorder): event shape, batch accounting, echo composition,
bounded buffer, and Chrome trace-format validity."""

import json

import pytest

from accvlab_tpu.pipeline import PipelineDefinition
from accvlab_tpu.pipeline.inputs import ShuffledShardedInputCallable
from accvlab_tpu.pipeline.processing_steps import (
    ImageDecoder,
    ImageRange01Normalizer,
    ImageToTileSizePadder,
    PhotoMetricDistorter,
)
from accvlab_tpu.tools import ChromeTraceRecorder

from test_pipeline_end_to_end import SyntheticProvider


def build_pipeline(batch_size=4, echo_factor=1, worker_mode="thread"):
    inp = ShuffledShardedInputCallable(
        SyntheticProvider(), batch_size=batch_size, shuffle=False
    )
    definition = PipelineDefinition(
        inp,
        [
            ImageDecoder("image"),
            ImageToTileSizePadder("image", 8),
            ImageRange01Normalizer("image"),
            # a device-placed step: exercises the device_dispatch span and
            # the per-step named_scope in the fused program
            PhotoMetricDistorter(
                "image",
                min_max_brightness=(0.9, 1.1),
                min_max_hue=(-0.05, 0.05),
                min_max_contrast=(0.9, 1.1),
                min_max_saturation=(0.9, 1.1),
            ),
        ],
        copy_external_source_passthrough_outputs=False,
    )
    return definition.get_pipeline(
        batch_size=batch_size, num_threads=2, seed=7, echo_factor=echo_factor,
        worker_mode=worker_mode,
    )


def _events(trace, name=None, ph=None):
    evs = trace.to_dict()["traceEvents"]
    if name is not None:
        evs = [e for e in evs if e.get("name") == name]
    if ph is not None:
        evs = [e for e in evs if e.get("ph") == ph]
    return evs


def test_trace_records_phase_spans_per_batch(tmp_path):
    pipe = build_pipeline(batch_size=4)
    try:
        trace = pipe.start_trace()
        n = 0
        for _ in pipe:
            n += 1
        path = tmp_path / "pipeline_trace.json"
        returned = pipe.stop_trace(str(path))
        assert returned is trace

        # the saved file is valid Chrome trace JSON
        with open(path) as f:
            doc = json.load(f)
        evs = doc["traceEvents"]

        # every delivered batch has its consumer-side spans; the producer
        # built at least that many host batches (epoch = 2 batches of 4)
        assert n == 2
        waits = [e for e in evs if e["name"] == "consumer_wait"]
        disps = [e for e in evs if e["name"] == "device_dispatch"]
        builds = [e for e in evs if e["name"] == "host_build"]
        assert len(waits) == n and len(disps) == n
        assert len(builds) >= n
        assert [e["args"]["batch"] for e in disps] == [0, 1]
        # epoch end is marked
        assert any(e["name"] == "epoch_end" and e["ph"] == "i" for e in evs)

        # spans are well-formed X events on named threads
        names = {
            e["tid"]: e["args"]["name"]
            for e in evs
            if e["ph"] == "M" and e["name"] == "thread_name"
        }
        assert set(names.values()) >= {"producer", "consumer"}
        for e in waits + disps + builds:
            assert e["ph"] == "X"
            assert e["ts"] >= 0.0 and e["dur"] >= 0.0
            assert names[e["tid"]] in ("producer", "consumer")
        # dispatch events carry the transferred byte count
        assert all(e["args"]["bytes"] > 0 for e in disps)
    finally:
        pipe.stop()


def test_trace_with_echo_factor_counts_replays():
    pipe = build_pipeline(batch_size=4, echo_factor=2)
    try:
        trace = pipe.start_trace()
        n = sum(1 for _ in pipe)
        pipe.stop_trace()
        disps = _events(trace, "device_dispatch")
        builds = _events(trace, "host_build")
        # 2 host batches, each delivered twice
        assert n == 4 and len(disps) == 4
        assert sorted((e["args"]["batch"], e["args"]["echo"]) for e in disps) == [
            (0, 0), (0, 1), (1, 0), (1, 1)
        ]
        assert len(builds) >= 2
        # replays reuse device-resident buffers: only the first delivery of
        # each host batch moves bytes over the wire
        for e in disps:
            if e["args"]["echo"] == 0:
                assert e["args"]["bytes"] > 0
            else:
                assert e["args"]["bytes"] == 0
    finally:
        pipe.stop()


def test_trace_reset_marks_epoch_boundary():
    pipe = build_pipeline(batch_size=4)
    try:
        pipe.start_trace()
        pipe.run()
        pipe.reset()
        pipe.run()
        trace = pipe.stop_trace()
        resets = _events(trace, "reset")
        assert len(resets) == 1 and resets[0]["ph"] == "i"
    finally:
        pipe.stop()


def test_trace_lifecycle_errors_and_isolation():
    pipe = build_pipeline(batch_size=4)
    try:
        with pytest.raises(RuntimeError, match="no active"):
            pipe.stop_trace()
        first = pipe.start_trace()
        with pytest.raises(RuntimeError, match="already active"):
            pipe.start_trace()
        pipe.run()
        pipe.stop_trace()
        # a new trace starts empty — no mixing with the previous recorder
        second = pipe.start_trace()
        assert second is not first and len(second) == 0
        pipe.run()
        pipe.stop_trace()
        assert len(second) > 0
    finally:
        pipe.stop()


def test_trace_with_process_workers():
    # worker_mode="process" produces host batches through the worker pool —
    # a different _produce_host_batch path; spans must still appear and the
    # producer timeline must stay on its own row
    pipe = build_pipeline(batch_size=4, worker_mode="process")
    try:
        trace = pipe.start_trace()
        n = sum(1 for _ in pipe)
        pipe.stop_trace()
        assert n == 2
        assert len(_events(trace, "host_build")) >= n
        assert len(_events(trace, "device_dispatch")) == n
    finally:
        pipe.stop()


def test_device_program_carries_step_name_scopes():
    # each device step runs under jax.named_scope(<class name>) inside the
    # fused program, so jax.profiler device traces and the lowered HLO's
    # metadata attribute time to pipeline steps (the per-operator NVTX
    # analog). Lower the pipeline's own device fn and look for the names.
    import jax

    pipe = build_pipeline(batch_size=4)
    try:
        step_names = [type(s).__name__ for s in pipe._device_steps]
        assert step_names  # the fixture must have device-placed steps
        _, _, _, host_batch = pipe._produce_host_batch()
        key = jax.random.PRNGKey(0)
        fn = pipe._build_device_fn(host_batch, key, donate=False)
        txt = fn.lower(host_batch, key).as_text(debug_info=True)
        for name in step_names:
            assert name in txt, f"named_scope {name!r} missing from HLO"
    finally:
        pipe.stop()


def test_recorder_bounds_and_validation():
    with pytest.raises(ValueError):
        ChromeTraceRecorder(max_events=0)
    rec = ChromeTraceRecorder(max_events=3)
    for i in range(5):
        rec.complete("x", "t", 0.0, 0.001, i=i)
    assert len(rec) == 3 and rec.dropped == 2
    doc = rec.to_dict()
    assert doc["accvlab_dropped_events"] == 2
    # still valid JSON with metadata first
    json.loads(json.dumps(doc))
    # negative durations are clamped, timestamps are relative microseconds
    rec2 = ChromeTraceRecorder()
    rec2.complete("y", "t", rec2.t0 + 0.5, -1.0)
    (ev,) = [e for e in rec2.to_dict()["traceEvents"] if e["ph"] == "X"]
    assert ev["dur"] == 0.0 and ev["ts"] == pytest.approx(5e5, rel=0.01)
    # a span that began before the recorder existed (in-flight across
    # start_trace) is clipped to the origin, keeping its tail duration
    rec3 = ChromeTraceRecorder()
    rec3.complete("z", "t", rec3.t0 - 0.1, 0.3)
    (ev,) = [e for e in rec3.to_dict()["traceEvents"] if e["ph"] == "X"]
    assert ev["ts"] == 0.0 and ev["dur"] == pytest.approx(2e5, rel=0.01)


def test_recorder_tid_assignment_is_race_free():
    # two threads registering their first event concurrently must land on
    # distinct timeline rows (tid assignment shares the event lock)
    import threading

    for _ in range(20):
        rec = ChromeTraceRecorder()
        barrier = threading.Barrier(2)

        def emit(name):
            barrier.wait()
            rec.complete("e", name, rec.t0, 0.001)

        ts = [threading.Thread(target=emit, args=(f"t{i}",)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        evs = rec.to_dict()["traceEvents"]
        tids = {e["tid"] for e in evs if e["ph"] == "X"}
        assert len(tids) == 2


def test_device_program_text_public_inspection():
    """device_program_text(): the public fused-program audit surface.

    Guards three invariants of the device stage at once: every
    device-placed step's named_scope is present (the program really is the
    fused composition), no float64 ever enters it (TPU-hostile dtype), and
    no host callback is embedded (a pure_callback/io_callback smuggled
    into a step would serialize the device stage on the host)."""
    pipe = build_pipeline(batch_size=4)
    try:
        with pytest.raises(RuntimeError, match="no device program built yet"):
            pipe.device_program_text()
        pipe.run()
        txt = pipe.device_program_text()
        for name in [type(s).__name__ for s in pipe._device_steps]:
            assert name in txt, f"step scope {name!r} missing"
        assert "f64" not in txt
        for marker in ("python_cpu_callback", "xla_ffi_python"):
            assert marker not in txt, f"host callback ({marker}) in device program"
        # optimized=True compiles: post-fusion backend HLO, non-empty and
        # distinct from the lowered text
        opt = pipe.device_program_text(optimized=True)
        assert isinstance(opt, str) and opt and opt != txt
    finally:
        pipe.stop()


def test_device_program_text_requires_device_steps():
    from accvlab_tpu.pipeline import PipelineDefinition
    from accvlab_tpu.pipeline.inputs import ShuffledShardedInputCallable

    inp = ShuffledShardedInputCallable(
        SyntheticProvider(), batch_size=2, shuffle=False
    )
    defn = PipelineDefinition(
        inp,
        [ImageDecoder("image"), ImageToTileSizePadder("image", 8)],
        copy_external_source_passthrough_outputs=False,
    )
    pipe = defn.get_pipeline(batch_size=2, num_threads=1, seed=0)
    try:
        pipe.run()
        with pytest.raises(RuntimeError, match="no device-placed steps"):
            pipe.device_program_text()
    finally:
        pipe.stop()

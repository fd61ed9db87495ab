"""Extended tools coverage: image dumps, per-sample ragged dumping, one-time
measurements, pickle/binary side files."""

import json
import os

import numpy as np
import pytest

from accvlab_tpu.ragged import RaggedBatch
from accvlab_tpu.tools import Stopwatch, TensorDumper


@pytest.fixture(autouse=True)
def fresh_singletons():
    Stopwatch._reset_singleton()
    TensorDumper._reset_singleton()
    yield


def test_image_dump_rgb_and_meta(tmp_path):
    td = TensorDumper()
    td.enable(str(tmp_path))
    img = np.zeros((8, 10, 3), np.float32)
    img[2:5, 3:7] = [1.0, 0.5, 0.25]
    td.add_tensor_data("img", img, TensorDumper.Type.IMAGE_RGB)
    td.dump()
    pngs = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
    assert len(pngs) == 1
    meta = json.load(open(tmp_path / (pngs[0] + ".meta.json")))
    assert meta["format"] == "IMAGE_RGB"
    assert meta["max"] == 1.0
    from PIL import Image

    arr = np.asarray(Image.open(tmp_path / pngs[0]))
    assert arr.shape == (8, 10, 3)
    assert arr[3, 4, 0] == 255  # max value maps to 255


def test_grayscale_image_with_leading_dims(tmp_path):
    td = TensorDumper()
    td.enable(str(tmp_path))
    td.add_tensor_data("stack", np.random.rand(3, 6, 8), TensorDumper.Type.IMAGE_I)
    td.dump()
    pngs = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
    assert len(pngs) == 3  # leading dim iterates over images


def test_pickle_dump_roundtrip(tmp_path):
    import pickle

    td = TensorDumper()
    td.enable(str(tmp_path))
    td.add_tensor_data("obj", np.arange(5), TensorDumper.Type.PICKLE)
    td.dump()
    pkls = [f for f in os.listdir(tmp_path) if f.endswith(".pkl")]
    data = pickle.load(open(tmp_path / pkls[0], "rb"))
    np.testing.assert_array_equal(data, np.arange(5))


def test_ragged_per_sample_dump(tmp_path):
    td = TensorDumper()
    td.enable(str(tmp_path))
    td.enable_ragged_batch_dumping(as_per_sample=True)
    rb = RaggedBatch(np.arange(6, dtype=np.float32).reshape(2, 3), sample_sizes=np.array([1, 3]))
    td.add_tensor_data("rb", rb, TensorDumper.Type.JSON)
    td.dump()
    doc = json.load(open(tmp_path / "dump_000000.json"))
    assert doc["rb/sample_0"]["shape"] == [1]
    assert doc["rb/sample_1"]["shape"] == [3]


def test_set_dump_type_for_all(tmp_path):
    td = TensorDumper()
    td.enable(str(tmp_path))
    td.add_tensor_data("a", np.ones(3), TensorDumper.Type.BINARY)
    td.add_tensor_data("b", np.ones(3), TensorDumper.Type.BINARY)
    td.set_dump_type_for_all(TensorDumper.Type.JSON)
    td.dump()
    doc = json.load(open(tmp_path / "dump_000000.json"))
    assert "values" in doc["a"] and "values" in doc["b"]  # JSON, not side files


def test_stopwatch_one_time_measurement(capsys):
    sw = Stopwatch()
    sw.enable(num_warmup_iters=0)
    sw.start_one_time_measurement("setup")
    sw.end_one_time_measurement("setup")
    out = capsys.readouterr().out
    assert "one-time 'setup'" in out


def test_stopwatch_periodic_print(capsys):
    sw = Stopwatch()
    sw.enable(num_warmup_iters=0, print_every_n_iters=2)
    for _ in range(4):
        sw.start_meas("x")
        sw.end_meas("x")
        sw.finish_iter()
    out = capsys.readouterr().out
    assert out.count("[Stopwatch] stats") == 2


def test_stopwatch_cpu_usage_accumulator():
    pytest.importorskip("psutil")
    sw = Stopwatch()
    sw.enable(num_warmup_iters=0)
    sw.set_cpu_usage_meas_name("cpu_section")
    sw.start_meas("cpu_section")
    sum(range(100000))
    sw.end_meas("cpu_section")
    acc = sw._accumulators["cpu_section"]
    assert isinstance(acc, Stopwatch._TimeAndCPUUsageAccumulator)
    assert acc.get_num_meas() == 1


def test_trace_ranges_under_real_profiler(tmp_path):
    """Ranges integrate with the actual jax.profiler trace (the NVTX/Nsight
    analog: annotations appear in the XLA trace)."""
    import jax

    from accvlab_tpu.tools import TraceRangeWrapper

    TraceRangeWrapper._reset_singleton()
    tr = TraceRangeWrapper()
    tr.enable()
    jax.profiler.start_trace(str(tmp_path))
    tr.range_push("annotated_section")
    jax.block_until_ready(jax.numpy.ones(8) * 2)
    tr.range_pop("annotated_section")
    jax.profiler.stop_trace()
    # a trace was written
    import glob

    assert glob.glob(str(tmp_path / "**" / "*.pb"), recursive=True) or glob.glob(
        str(tmp_path / "**" / "*.json.gz"), recursive=True
    )

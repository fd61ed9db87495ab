"""Tools tests: Stopwatch, TraceRangeWrapper, TensorDumper
(model: reference optim_test_tools usage patterns)."""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from accvlab_tpu.ragged import RaggedBatch
from accvlab_tpu.tools import Stopwatch, TensorDumper, TraceRangeWrapper


@pytest.fixture(autouse=True)
def fresh_singletons():
    Stopwatch._reset_singleton()
    TraceRangeWrapper._reset_singleton()
    TensorDumper._reset_singleton()
    yield


def test_stopwatch_disabled_noop():
    sw = Stopwatch()
    sw.start_meas("x")
    sw.end_meas("x")
    sw.finish_iter()
    assert not sw.is_enabled  # property, like the reference


def test_stopwatch_singleton():
    assert Stopwatch() is Stopwatch()


def test_stopwatch_measures():
    sw = Stopwatch()
    sw.enable(num_warmup_iters=1, print_every_n_iters=None)
    for _ in range(3):
        sw.start_meas("work")
        time.sleep(0.01)
        sw.end_meas("work")
        sw.finish_iter()
    assert sw.get_num_nonwarmup_iters_measured() == 2
    assert 0.005 < sw.get_mean_time("work") < 0.1
    sw.print_eval_times()


def test_stopwatch_warmup_skipped():
    sw = Stopwatch()
    sw.enable(num_warmup_iters=2, print_every_n_iters=None)
    sw.start_meas("a")
    sw.end_meas("a")
    sw.finish_iter()
    assert np.isnan(sw.get_mean_time("a"))  # still warming up


def test_trace_ranges():
    tr = TraceRangeWrapper()
    tr.enable(keep_track_of_range_order=True)
    tr.range_push("outer")
    tr.range_push("inner")
    tr.range_pop("inner")
    tr.range_pop("outer")
    with pytest.raises(AssertionError):
        tr.range_pop()


def test_trace_range_order_check():
    tr = TraceRangeWrapper()
    tr.enable(keep_track_of_range_order=True)
    tr.range_push("a")
    with pytest.raises(AssertionError):
        tr.range_pop("b")


def test_tensor_dumper_roundtrip(tmp_path):
    td = TensorDumper()
    td.enable(str(tmp_path / "ref"))
    td.push_range("iter")
    td.add_tensor_data("x", jnp.arange(6.0).reshape(2, 3), TensorDumper.Type.JSON)
    td.add_tensor_data("big", np.ones((4, 5), np.float32), TensorDumper.Type.BINARY)
    td.pop_range()
    td.dump()
    assert (tmp_path / "ref" / "dump_000000.json").exists()

    # identical second run compares clean
    TensorDumper._reset_singleton()
    td2 = TensorDumper()
    td2.enable(str(tmp_path / "cur"))
    td2.set_dump_is_compare(str(tmp_path / "ref"))
    td2.push_range("iter")
    td2.add_tensor_data("x", jnp.arange(6.0).reshape(2, 3), TensorDumper.Type.JSON)
    td2.add_tensor_data("big", np.ones((4, 5), np.float32), TensorDumper.Type.BINARY)
    td2.pop_range()
    errors = td2.compare_to_dumped_data()
    assert errors == []


def test_tensor_dumper_detects_mismatch(tmp_path):
    td = TensorDumper()
    td.enable(str(tmp_path))
    td.add_tensor_data("x", jnp.zeros(3), TensorDumper.Type.JSON)
    td.dump()
    td.set_dump_is_compare(str(tmp_path))
    td.reset_dump_count()
    td.add_tensor_data("x", jnp.array([0.0, 0.1, 0.0]), TensorDumper.Type.JSON)
    with pytest.raises(ValueError, match="mismatching"):
        td.compare_to_dumped_data(eps_numerical_data=1e-6)
    # as_warning: warn instead of raising, return the error list
    with pytest.warns(UserWarning, match="mismatching"):
        errors = td.compare_to_dumped_data(eps_numerical_data=1e-6, as_warning=True)
    assert len(errors) == 1


def test_tensor_dumper_tolerance(tmp_path):
    td = TensorDumper()
    td.enable(str(tmp_path))
    td.add_tensor_data("x", jnp.zeros(3), TensorDumper.Type.JSON)
    td.dump()
    td.set_dump_is_compare(str(tmp_path))
    td.reset_dump_count()
    td.add_tensor_data("x", jnp.full((3,), 1e-8), TensorDumper.Type.JSON)
    assert td.compare_to_dumped_data(eps_numerical_data=1e-6) == []


def test_tensor_dumper_ragged(tmp_path):
    td = TensorDumper()
    td.enable(str(tmp_path))
    td.enable_ragged_batch_dumping()
    rb = RaggedBatch(jnp.ones((2, 3)), sample_sizes=jnp.array([1, 3]))
    td.add_tensor_data("rb", rb, TensorDumper.Type.JSON)
    td.dump()
    import json

    doc = json.load(open(tmp_path / "dump_000000.json"))
    assert "rb/tensor" in doc and "rb/sample_sizes" in doc


def test_tensor_dumper_grads(tmp_path):
    import jax

    td = TensorDumper()
    td.enable(str(tmp_path))
    x = jnp.array([1.0, 2.0])
    g = jax.grad(lambda v: jnp.sum(v * v))(x)
    td.add_grad_data("x", x, TensorDumper.Type.JSON)
    td.set_gradients(g)
    td.dump()
    import json

    doc = json.load(open(tmp_path / "dump_000000.json"))
    np.testing.assert_allclose(doc["grads/x"]["values"], [2.0, 4.0])


def test_tensor_dumper_missing_grads_asserts(tmp_path):
    td = TensorDumper()
    td.enable(str(tmp_path))
    td.add_grad_data("x", jnp.ones(2), TensorDumper.Type.JSON)
    with pytest.raises(AssertionError):
        td.dump()


def test_perform_after_dump_count(tmp_path):
    td = TensorDumper()
    td.enable(str(tmp_path))
    hits = []
    td.perform_after_dump_count(2, lambda: hits.append(1))
    td.add_tensor_data("x", jnp.zeros(1), TensorDumper.Type.JSON)
    td.dump()
    assert hits == []
    td.add_tensor_data("x", jnp.zeros(1), TensorDumper.Type.JSON)
    td.dump()
    assert hits == [1]


def test_custom_converter(tmp_path):
    class Wrapped:
        def __init__(self, v):
            self.v = v

    td = TensorDumper()
    td.enable(str(tmp_path))
    td.register_custom_converter(Wrapped, lambda w: np.asarray(w.v))
    td.add_tensor_data("w", Wrapped([1.0, 2.0]), TensorDumper.Type.JSON)
    td.dump()
    import json

    doc = json.load(open(tmp_path / "dump_000000.json"))
    assert doc["w"]["values"] == [1.0, 2.0]

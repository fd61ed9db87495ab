"""shared_jit: process-global compiled-program sharing.

The property under test: two *structurally identical* programs built from
distinct function objects share one compiled executable (jax.jit would
recompile — it caches per function object), while every caller still
computes with its OWN captured constants; structurally different programs
never share. This is the recompile-free-restart capability the pipeline
executor builds every fused device program through
(``accvlab_tpu/pipeline/pipeline.py``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from accvlab_tpu.tools import program_cache_stats, shared_jit
from accvlab_tpu.tools.program_cache import _SharedProgram


def _stats_delta(before, after):
    return {k: after[k] - before[k] for k in ("hits", "misses", "declined")}


def make_fn(table):
    # a fresh closure per call — jax.jit would treat each as a new program
    def fn(x, y):
        return (x @ jnp.asarray(table)).sum(axis=1) + y, x * 2.0

    return fn


def test_structurally_identical_builds_share():
    t = np.arange(12, dtype=np.float32).reshape(3, 4)
    ex = (jnp.ones((5, 3)), jnp.zeros((5,)))
    before = program_cache_stats()
    f1 = shared_jit(make_fn(t.copy()), ex)
    f2 = shared_jit(make_fn(t.copy()), ex)
    d = _stats_delta(before, program_cache_stats())
    assert d["misses"] == 1 and d["hits"] == 1 and d["declined"] == 0
    assert isinstance(f1, _SharedProgram) and isinstance(f2, _SharedProgram)
    # both share ONE underlying jitted wrapper (one compiled executable)
    assert f1._jitted is f2._jitted

    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32))
    y = jnp.arange(5, dtype=jnp.float32)
    a, b = f1(x, y)
    ea, eb = make_fn(t)(x, y)
    np.testing.assert_allclose(np.asarray(a), np.asarray(ea), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(b), np.asarray(eb))


def test_shared_program_uses_each_callers_own_consts():
    """Sharing is keyed on const STRUCTURE, not values: callers with
    different captured tables share the executable but get their own
    results."""
    t1 = np.full((3, 4), 2.0, np.float32)
    t2 = np.full((3, 4), -5.0, np.float32)
    ex = (jnp.ones((2, 3)), jnp.zeros((2,)))
    f1 = shared_jit(make_fn(t1), ex)
    f2 = shared_jit(make_fn(t2), ex)
    assert f1._jitted is f2._jitted
    x = jnp.ones((2, 3))
    y = jnp.zeros((2,))
    np.testing.assert_allclose(np.asarray(f1(x, y)[0]), 3 * 2.0 * 4)
    np.testing.assert_allclose(np.asarray(f2(x, y)[0]), 3 * -5.0 * 4)


def test_different_structure_does_not_share():
    ex = (jnp.ones((4, 3)),)

    def f(x):
        return jnp.tanh(x).sum()

    def g(x):
        return jnp.exp(x).sum()

    before = program_cache_stats()
    shared_jit(f, ex)
    shared_jit(g, ex)
    d = _stats_delta(before, program_cache_stats())
    assert d["misses"] == 2 and d["hits"] == 0


def test_different_shapes_do_not_share():
    def f(x):
        return x * 3.0

    before = program_cache_stats()
    shared_jit(f, (jnp.ones((4,)),))
    shared_jit(f, (jnp.ones((8,)),))
    d = _stats_delta(before, program_cache_stats())
    assert d["misses"] == 2 and d["hits"] == 0


def test_donation_consumes_input_buffers():
    def f(x, y):
        return x + 1.0, y

    ex = (jnp.ones((16, 16)), jnp.zeros((2,)))
    fn = shared_jit(f, ex, donate_argnums=(0,))
    x = jnp.full((16, 16), 3.0)
    y = jnp.zeros((2,))
    out, _ = fn(x, y)
    np.testing.assert_allclose(np.asarray(out), 4.0)
    assert x.is_deleted()  # the donated buffer was consumed
    assert not y.is_deleted()


def test_env_kill_switch(monkeypatch):
    monkeypatch.setenv("ACCVLAB_SHARE_PROGRAMS", "0")

    def f(x):
        return x + 1

    before = program_cache_stats()
    fn = shared_jit(f, (jnp.ones((3,)),))
    d = _stats_delta(before, program_cache_stats())
    assert d["declined"] == 1 and d["misses"] == 0
    assert not isinstance(fn, _SharedProgram)
    np.testing.assert_allclose(np.asarray(fn(jnp.ones((3,)))), 2.0)


def test_large_consts_fall_back_to_plain_jit():
    big = np.ones((300, 300), np.float32)  # 360 KB > the 64 KB cap

    def f(x):
        return x + jnp.asarray(big)[: x.shape[0], : x.shape[1]]

    before = program_cache_stats()
    fn = shared_jit(f, (jnp.ones((2, 2)),))
    d = _stats_delta(before, program_cache_stats())
    assert d["declined"] == 1
    assert not isinstance(fn, _SharedProgram)
    np.testing.assert_allclose(np.asarray(fn(jnp.ones((2, 2)))), 2.0)


def test_lru_bound_holds():
    from accvlab_tpu.tools import program_cache as pc

    for i in range(pc._CACHE_MAX + 8):
        n = i + 1

        def f(x, n=n):
            return x * float(n)

        shared_jit(f, (jnp.ones((2,)),))
    assert program_cache_stats()["size"] <= pc._CACHE_MAX


def test_lower_audit_surface():
    def f(x):
        return jnp.sin(x) * 2.0

    fn = shared_jit(f, (jnp.ones((4,)),))
    txt = fn.lower(jax.ShapeDtypeStruct((4,), jnp.float32)).as_text()
    assert "sine" in txt


def test_train_step_restart_shares(monkeypatch):
    """The public use case: a restarted trainer's freshly-built train step
    (same model, same shapes) reuses the first build's executable."""
    import optax

    def build_step():
        opt = optax.sgd(0.1)

        def loss_fn(params, batch):
            pred = batch["x"] @ params["w"]
            return jnp.mean((pred - batch["y"]) ** 2)

        def train_step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        return opt, train_step

    params = {"w": jnp.ones((3, 2))}
    batch = {"x": jnp.ones((4, 3)), "y": jnp.zeros((4, 2))}

    opt, step1 = build_step()
    ex = (params, opt.init(params), batch)
    before = program_cache_stats()
    s1 = shared_jit(step1, ex)
    p1, o1, l1 = s1(*ex)

    _, step2 = build_step()  # the "restarted process" rebuild
    s2 = shared_jit(step2, ex)
    d = _stats_delta(before, program_cache_stats())
    assert d["misses"] == 1 and d["hits"] == 1
    p2, o2, l2 = s2(*ex)
    assert float(l1) == float(l2)
    np.testing.assert_array_equal(np.asarray(p1["w"]), np.asarray(p2["w"]))
    # and the step actually trains
    for _ in range(20):
        p2, o2, l = s2(p2, o2, batch)
    assert float(l) < float(l2)


def test_pipeline_rebuild_reuses_fused_program():
    """End to end through the executor: re-creating the same pipeline (the
    checkpoint-resume/preemption pattern) registers a cache hit for its
    fused device program and delivers bit-identical output."""
    from accvlab_tpu.pipeline import DType, PipelineDefinition, SampleDataGroup
    from accvlab_tpu.pipeline.inputs import DataProvider, ShuffledShardedInputCallable
    from accvlab_tpu.pipeline.processing_steps import ImageRange01Normalizer

    class P(DataProvider):
        @property
        def sample_data_structure(self):
            s = SampleDataGroup()
            s.add_data_field("image", DType.UINT8)
            return s

        def get_data(self, i):
            s = self.sample_data_structure
            s["image"] = np.full((6, 6, 3), i * 7 % 255, np.uint8)
            return s

        def get_number_of_samples(self):
            return 8

    class DeviceNorm(ImageRange01Normalizer):
        placement = "device"

    def build():
        inp = ShuffledShardedInputCallable(P(), batch_size=4, shuffle=False)
        defn = PipelineDefinition(
            inp, [DeviceNorm("image")],
            copy_external_source_passthrough_outputs=False,
        )
        return defn.get_pipeline(batch_size=4, num_threads=1, seed=0)

    before = program_cache_stats()
    p1 = build()
    try:
        first = np.asarray(p1.run()["image"])
    finally:
        p1.stop()
    mid = program_cache_stats()
    assert _stats_delta(before, mid)["misses"] >= 1
    p2 = build()
    try:
        again = np.asarray(p2.run()["image"])
    finally:
        p2.stop()
    d = _stats_delta(mid, program_cache_stats())
    assert d["hits"] >= 1 and d["misses"] == 0
    np.testing.assert_array_equal(first, again)


def test_mismatched_call_fails_loudly():
    def f(x):
        return x * 2

    fn = shared_jit(f, (jnp.ones((4,), jnp.float32),))
    with pytest.raises(TypeError, match="traced with"):
        fn(jnp.ones((8,), jnp.float32))
    with pytest.raises(TypeError, match="traced with"):
        fn(jnp.ones((4,), jnp.int32))
    with pytest.raises(TypeError, match="leaves"):
        fn(jnp.ones((4,)), jnp.ones((4,)))


def test_typed_prng_key_args_share():
    def f(x, key):
        return x + jax.random.uniform(key, x.shape)

    ex = (jnp.ones((3,)), jax.random.key(0))
    before = program_cache_stats()
    f1 = shared_jit(f, ex)
    f2 = shared_jit(f, ex)
    d = _stats_delta(before, program_cache_stats())
    assert d["misses"] == 1 and d["hits"] == 1
    np.testing.assert_array_equal(
        np.asarray(f1(jnp.ones((3,)), jax.random.key(7))),
        np.asarray(f2(jnp.ones((3,)), jax.random.key(7))),
    )


def test_consts_are_captured_by_value():
    """Mutating a captured table after build must not change results (plain
    jax.jit bakes the trace-time value; the shared path must match)."""
    table = np.full((2, 2), 1.0, np.float32)

    def f(x):
        return x + jnp.asarray(table)

    fn = shared_jit(f, (jnp.zeros((2, 2)),))
    table[:] = 100.0
    np.testing.assert_allclose(np.asarray(fn(jnp.zeros((2, 2)))), 1.0)


def test_out_of_range_donate_argnums_raises():
    def f(x, y):
        return x + y

    with pytest.raises(ValueError, match="donate_argnums"):
        shared_jit(f, (jnp.ones((2,)), jnp.ones((2,))), donate_argnums=(5,))


def test_scalar_leaf_dtype_guard():
    """Python-scalar leaves are dtype-checked via canonicalization, so an
    int where a float was traced fails at the boundary, not inside
    eval_jaxpr."""
    def f(x, s):
        return x * s

    fn = shared_jit(f, (jnp.ones((3,)), 0.5))
    np.testing.assert_allclose(np.asarray(fn(jnp.ones((3,)), 2.0)), 2.0)
    with pytest.raises(TypeError, match="traced with"):
        fn(jnp.ones((3,)), 7)


def test_stats_surface_in_pipeline_stats():
    """pipe.stats() exposes the global program-cache counters."""
    from accvlab_tpu.pipeline import DType, PipelineDefinition, SampleDataGroup
    from accvlab_tpu.pipeline.inputs import DataProvider, ShuffledShardedInputCallable

    class P(DataProvider):
        @property
        def sample_data_structure(self):
            s = SampleDataGroup()
            s.add_data_field("x", DType.FLOAT)
            return s

        def get_data(self, i):
            s = self.sample_data_structure
            s["x"] = np.zeros((2,), np.float32)
            return s

        def get_number_of_samples(self):
            return 4

    inp = ShuffledShardedInputCallable(P(), batch_size=2, shuffle=False)
    pipe = PipelineDefinition(
        inp, [], copy_external_source_passthrough_outputs=False
    ).get_pipeline(batch_size=2, num_threads=1, seed=0)
    try:
        pipe.run()
        pc = pipe.stats()["program_cache"]
        assert set(pc) == {"hits", "misses", "declined", "size"}
    finally:
        pipe.stop()


def test_dispatch_context_still_keys_compiles_on_shared_wrapper():
    """Compile-affecting config (default matmul precision) is handled at
    DISPATCH by jax's own jit cache, not by the build-time sharing key:
    builds under different settings share ONE wrapper, and dispatching it
    under distinct precision contexts compiles distinct executables (no
    stale-precision reuse)."""
    def f(x, y):
        return x @ y

    ex = (jnp.ones((4, 4)), jnp.ones((4, 4)))
    before = program_cache_stats()
    s1 = shared_jit(f, ex)
    # a TRACE-time precision context bakes precision= into the jaxpr's dot
    # eqns, so builds under different contexts key apart via the text —
    # no explicit config entry needed in the key
    with jax.default_matmul_precision("float32"):
        s_f32 = shared_jit(f, ex)
    d = _stats_delta(before, program_cache_stats())
    assert d["misses"] == 2 and d["hits"] == 0
    assert s1._jitted is not s_f32._jitted
    s2 = shared_jit(f, ex)  # same (default) context -> shares
    d = _stats_delta(before, program_cache_stats())
    assert d["hits"] == 1
    assert s1._jitted is s2._jitted

    jitted = s1._jitted
    s1(*ex)
    n0 = jitted._cache_size()
    with jax.default_matmul_precision("highest"):
        s1(*ex)
    assert jitted._cache_size() == n0 + 1  # distinct executable
    with jax.default_matmul_precision("highest"):
        s2(*ex)
    assert jitted._cache_size() == n0 + 1  # same context -> reused

"""hostcopy tests (model: reference tests/test_multi_tensor_copier.py:
structure preservation, numpy conversion, opaque leaves, pack/non-pack
matrix, mixed dtypes + alignment, chunking)."""

import numpy as np
import pytest

from accvlab_tpu.hostcopy import start_copy


def nested_payload():
    rng = np.random.default_rng(0)
    return {
        "meta": {
            "boxes": rng.normal(size=(7, 4)).astype(np.float32),
            "ids": rng.integers(0, 100, (7,)).astype(np.int32),
            "tag": "opaque-string",
        },
        "list": [rng.normal(size=(3,)).astype(np.float32), 5, 2.5],
        "big": rng.normal(size=(600, 600)).astype(np.float32),  # > pack threshold
    }


@pytest.mark.parametrize("pack", [True, False])
@pytest.mark.parametrize("background", [True, False])
def test_structure_and_values(pack, background):
    data = nested_payload()
    handle = start_copy(
        data, pack_cpu_tensors=pack, use_background_thread=background
    )
    out = handle.get()
    assert out["meta"]["tag"] == "opaque-string"
    np.testing.assert_array_equal(np.asarray(out["meta"]["boxes"]), data["meta"]["boxes"])
    np.testing.assert_array_equal(np.asarray(out["meta"]["ids"]), data["meta"]["ids"])
    np.testing.assert_array_equal(np.asarray(out["list"][0]), data["list"][0])
    assert int(out["list"][1]) == 5
    np.testing.assert_array_equal(np.asarray(out["big"]), data["big"])
    import jax

    assert isinstance(out["big"], jax.Array)


def test_ready_eventually_true():
    handle = start_copy(nested_payload())
    out = handle.get()
    assert handle.ready()
    assert out is handle.get()


def test_many_small_tensors():
    rng = np.random.default_rng(1)
    data = [rng.normal(size=(rng.integers(1, 50),)).astype(np.float32) for _ in range(200)]
    out = start_copy(data).get()
    for a, b in zip(out, data):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_mixed_dtypes_alignment():
    data = {
        "u8": np.arange(13, dtype=np.uint8),
        "f64": np.arange(5, dtype=np.float64),
        "i16": np.arange(9, dtype=np.int16),
        "b": np.array([True, False, True]),
    }
    out = start_copy(data, min_packed_alignment_bytes=16).get()
    for k in data:
        np.testing.assert_array_equal(np.asarray(out[k]), data[k])
        import jax.numpy as jnp; assert out[k].dtype == jnp.result_type(data[k].dtype)  # 64-bit canonicalized without x64


def test_chunking_small_max_chunk():
    rng = np.random.default_rng(2)
    data = [rng.normal(size=(100,)).astype(np.float32) for _ in range(50)]
    out = start_copy(data, max_packed_chunk_bytes=1024).get()
    for a, b in zip(out, data):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_empty_arrays_pass():
    data = {"empty": np.zeros((0, 4), np.float32), "x": np.ones(3, np.float32)}
    out = start_copy(data).get()
    assert np.asarray(out["empty"]).shape == (0, 4)


def test_jax_array_passthrough():
    import jax.numpy as jnp

    data = {"dev": jnp.arange(5), "host": np.arange(3)}
    out = start_copy(data).get()
    np.testing.assert_array_equal(np.asarray(out["dev"]), np.arange(5))


def test_native_packer_builds():
    from accvlab_tpu.hostcopy.native import get_lib, parallel_pack

    arrays = [np.full((10,), i, np.float32) for i in range(4)]
    offsets = [i * 48 for i in range(4)]  # 40 bytes data + 8 pad
    staging = parallel_pack(arrays, offsets, 4 * 48)
    for i in range(4):
        got = staging[i * 48 : i * 48 + 40].view(np.float32)
        np.testing.assert_array_equal(got, arrays[i])
    # native lib should be available in this image (g++ baked in)
    assert get_lib() is not None


@pytest.mark.parametrize("seed", range(12))
def test_start_copy_random_trees_match_device_put(seed):
    """Random nested structures (mixed dtypes, scalars, strings, jax arrays,
    0-d, non-contiguous) transfer identically to a plain device_put."""
    import jax

    rng = np.random.default_rng(seed)

    def leaf():
        roll = rng.random()
        if roll < 0.15:
            return float(rng.normal())
        if roll < 0.25:
            return int(rng.integers(-100, 100))
        if roll < 0.32:
            return f"token_{rng.integers(0, 999)}"
        if roll < 0.42:
            return np.float32(rng.normal())  # 0-d
        shape = tuple(rng.integers(1, 6, rng.integers(1, 4)))
        dt = rng.choice([np.float32, np.int32, np.uint8, np.bool_])
        arr = (rng.normal(size=shape) * 10).astype(dt)
        if rng.random() < 0.3 and arr.ndim >= 2:
            arr = arr.T  # non-contiguous
        return arr

    def tree(depth):
        if depth >= 2 or rng.random() < 0.4:
            return leaf()
        kind = rng.random()
        n = int(rng.integers(1, 4))
        if kind < 0.5:
            return {f"k{i}": tree(depth + 1) for i in range(n)}
        if kind < 0.8:
            return [tree(depth + 1) for _ in range(n)]
        return tuple(tree(depth + 1) for _ in range(n))

    data = tree(0)
    out = start_copy(data, use_background_thread=bool(rng.integers(0, 2))).get()

    flat_in, _ = jax.tree_util.tree_flatten(
        data, is_leaf=lambda x: not isinstance(x, (dict, list, tuple))
    )
    flat_out, _ = jax.tree_util.tree_flatten(
        out, is_leaf=lambda x: not isinstance(x, (dict, list, tuple))
    )
    assert len(flat_in) == len(flat_out)
    for a, b in zip(flat_in, flat_out):
        if isinstance(a, str):
            assert b == a  # opaque pass-through
        else:
            expect = np.asarray(jax.device_put(np.asarray(a)))
            np.testing.assert_array_equal(np.asarray(b), expect)


def test_concurrent_parallel_pack_threads():
    """Regression for the PackPool race: concurrent accvlab_pack calls used to
    trample each other's task lists (Run() mutated shared state unlocked).
    Many threads pack simultaneously; every staging buffer must be bit-exact."""
    import threading

    from accvlab_tpu.hostcopy.native import parallel_pack

    rng = np.random.default_rng(7)
    n_threads, n_iters = 8, 30
    payloads = []
    for t in range(n_threads):
        arrays = [
            rng.integers(0, 255, size=(int(rng.integers(1, 4000)),)).astype(np.uint8)
            for _ in range(40)
        ]
        offsets, total = [], 0
        for a in arrays:
            offsets.append(total)
            total += (a.nbytes + 15) // 16 * 16
        payloads.append((arrays, offsets, total))

    errors = []

    def worker(t):
        arrays, offsets, total = payloads[t]
        try:
            for _ in range(n_iters):
                staging = parallel_pack(arrays, offsets, total)
                for a, off in zip(arrays, offsets):
                    if not np.array_equal(staging[off : off + a.nbytes], a):
                        raise AssertionError(f"thread {t}: corrupted staging buffer")
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors


def test_concurrent_start_copy_background():
    """Two+ in-flight background copies (the armed production scenario)."""
    rng = np.random.default_rng(8)
    datasets = [
        [rng.normal(size=(int(rng.integers(10, 500)),)).astype(np.float32) for _ in range(60)]
        for _ in range(6)
    ]
    handles = [
        start_copy(d, pack_cpu_tensors=True, use_background_thread=True)
        for d in datasets
    ]
    for h, d in zip(handles, datasets):
        out = h.get()
        for a, b in zip(out, d):
            np.testing.assert_array_equal(np.asarray(a), b)


# ---- D2H + mixed-source-device trees (reference rows:
# test_multi_tensor_copier_gpu_to_cpu:234, ..._many_small_tensors:284,
# ..._mixed_devices:307) ------------------------------------------------- #


@pytest.mark.parametrize("pack", [True, False])
@pytest.mark.parametrize("background", [True, False])
def test_device_to_host(pack, background):
    import jax

    rng = np.random.default_rng(3)
    host_np = rng.normal(size=(4,)).astype(np.float32)
    tree = {
        "dev": {
            "a": jax.numpy.asarray(rng.normal(size=(5, 3)).astype(np.float32)),
            "b": jax.numpy.asarray(rng.integers(0, 9, (6,)).astype(np.int32)),
        },
        "big": jax.numpy.asarray(
            rng.normal(size=(600, 600)).astype(np.float32)
        ),  # > pack threshold
        "host": host_np,
        "tag": "opaque",
        "scalar": 7,
    }
    out = start_copy(
        tree, device="cpu", pack_cpu_tensors=pack, use_background_thread=background
    ).get()
    assert isinstance(out["dev"]["a"], np.ndarray)
    assert isinstance(out["dev"]["b"], np.ndarray)
    assert isinstance(out["big"], np.ndarray)
    np.testing.assert_array_equal(out["dev"]["a"], np.asarray(tree["dev"]["a"]))
    np.testing.assert_array_equal(out["dev"]["b"], np.asarray(tree["dev"]["b"]))
    np.testing.assert_array_equal(out["big"], np.asarray(tree["big"]))
    assert out["host"] is host_np  # already host-resident: passes through
    assert out["tag"] == "opaque" and out["scalar"] == 7


def test_device_to_host_many_small_tensors():
    """Many small device arrays pack into few transfers and round-trip
    exactly (reference: gpu_to_cpu_many_small_tensors:284)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    srcs = [rng.normal(size=(rng.integers(1, 50),)).astype(np.float32) for _ in range(64)]
    tree = [jnp.asarray(s) for s in srcs]
    out = start_copy(tree, device="cpu").get()
    assert all(isinstance(o, np.ndarray) for o in out)
    for o, s in zip(out, srcs):
        np.testing.assert_array_equal(o, s)


def test_device_to_host_mixed_dtypes():
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    srcs = {
        "f32": rng.normal(size=(9,)).astype(np.float32),
        "i32": rng.integers(-5, 5, (11,)).astype(np.int32),
        "u8": rng.integers(0, 255, (13,)).astype(np.uint8),
        "bool": rng.integers(0, 2, (7,)).astype(bool),
    }
    tree = {k: jnp.asarray(v) for k, v in srcs.items()}
    out = start_copy(tree, device="cpu").get()
    for k, v in srcs.items():
        assert out[k].dtype == v.dtype
        np.testing.assert_array_equal(out[k], v)


def test_mixed_source_devices_to_one_device():
    """Tree whose jax leaves live on different devices, consolidated onto one
    target device together with host leaves (reference: mixed_devices:307)."""
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    rng = np.random.default_rng(6)
    a = jax.device_put(rng.normal(size=(5,)).astype(np.float32), devs[0])
    b = jax.device_put(rng.normal(size=(6,)).astype(np.float32), devs[1])
    host = rng.normal(size=(4,)).astype(np.float32)
    target = devs[1]
    out = start_copy({"a": a, "b": b, "h": host}, device=target).get()
    for key in ("a", "b", "h"):
        assert out[key].devices() == {target}
    np.testing.assert_array_equal(np.asarray(out["a"]), np.asarray(a))
    np.testing.assert_array_equal(np.asarray(out["b"]), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(out["h"]), host)


def test_mixed_source_devices_to_host():
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    rng = np.random.default_rng(7)
    srcs = [rng.normal(size=(8,)).astype(np.float32) for _ in range(4)]
    tree = [jax.device_put(s, devs[i % len(devs)]) for i, s in enumerate(srcs)]
    out = start_copy(tree, device="cpu").get()
    for o, s in zip(out, srcs):
        assert isinstance(o, np.ndarray)
        np.testing.assert_array_equal(o, s)


def test_d2h_chunking_small_max_chunk():
    """max_packed_chunk_bytes bounds the packed D2H concat size too."""
    import jax.numpy as jnp

    rng = np.random.default_rng(8)
    srcs = [rng.normal(size=(100,)).astype(np.float32) for _ in range(10)]
    tree = [jnp.asarray(s) for s in srcs]
    out = start_copy(tree, device="cpu", max_packed_chunk_bytes=1024).get()
    for o, s in zip(out, srcs):
        np.testing.assert_array_equal(o, s)


@pytest.mark.parametrize("align", [1, 16, 64, 256])
def test_d2h_alignment_honored(align):
    """min_packed_alignment_bytes shapes the packed D2H layout exactly like
    the H2D side (reference: layout_packed_offsets alignment buckets,
    multi_tensor_copier.cpp:513): odd-size arrays at every alignment still
    round-trip exactly."""
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    srcs = [
        rng.integers(0, 255, (n,)).astype(np.uint8) for n in (1, 3, 7, 13, 64, 129)
    ]
    tree = [jnp.asarray(s) for s in srcs]
    out = start_copy(tree, device="cpu", min_packed_alignment_bytes=align).get()
    for o, s in zip(out, srcs):
        np.testing.assert_array_equal(o, s)


def test_d2h_helper_cache_is_bounded():
    """Varying tree shapes must not grow the jitted-helper caches without
    bound (each spec is a distinct compiled program)."""
    import jax.numpy as jnp

    from accvlab_tpu.hostcopy import async_copy as ac

    assert len(ac._d2h_packer_cache) <= ac._HELPER_CACHE_MAX
    start = len(ac._d2h_packer_cache)
    rng = np.random.default_rng(10)
    for trial in range(6):
        sizes = [int(rng.integers(1, 40)) for _ in range(4)]
        tree = [jnp.asarray(np.arange(n, dtype=np.float32)) for n in sizes]
        out = start_copy(tree, device="cpu").get()
        for o, n in zip(out, sizes):
            np.testing.assert_array_equal(o, np.arange(n, dtype=np.float32))
    assert len(ac._d2h_packer_cache) <= ac._HELPER_CACHE_MAX
    assert len(ac._slicer_cache) <= ac._HELPER_CACHE_MAX


def test_d2h_alignment_with_chunk_split():
    """Aligned element accounting must agree with the chunk-split bound."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    srcs = [rng.normal(size=(int(rng.integers(1, 60)),)).astype(np.float32)
            for _ in range(24)]
    tree = [jnp.asarray(s) for s in srcs]
    out = start_copy(
        tree, device="cpu", min_packed_alignment_bytes=64,
        max_packed_chunk_bytes=512,
    ).get()
    for o, s in zip(out, srcs):
        np.testing.assert_array_equal(o, s)


def test_coalesced_plan_dispatch_count(monkeypatch):
    """With pack_candidate_max_bytes raised, a many-field tree (mixed dtypes,
    large fields, empties) must cost one device_put per (dtype, chunk) plus
    ONE slicer dispatch — the fixed per-round-trip cost was the measured
    bottleneck of the DCT wire on the remote-attach tunnel
    (docs/bench_watch_r05.jsonl runs 1-5: 34 puts + 4 slicer execs = ~750 ms
    of the 1036 ms batch)."""
    import jax

    from accvlab_tpu.hostcopy import async_copy as ac

    rng = np.random.default_rng(0)
    tree = (
        [rng.integers(0, 255, (700_000,), np.uint8) for _ in range(2)]  # big
        + [rng.integers(0, 255, (int(rng.integers(1, 5000)),), np.uint8)
           for _ in range(40)]
        + [rng.integers(-100, 100, (int(rng.integers(1, 300)),), np.int32)
           for _ in range(20)]
        + [np.zeros((0,), np.uint32) for _ in range(25)]  # empty exceptions
        + [np.zeros((4, 0), np.int16) for _ in range(3)]
    )
    puts = {"n": 0}
    orig_put = jax.device_put

    def counting_put(x, device=None, **kw):
        puts["n"] += 1
        return orig_put(x, device, **kw)

    monkeypatch.setattr(jax, "device_put", counting_put)
    slicer_execs = {"n": 0}
    orig_ms = ac._get_multi_slicer

    def counting_ms(spec):
        fn = orig_ms(spec)

        def wrapped(*chunks):
            slicer_execs["n"] += 1
            return fn(*chunks)

        return wrapped

    monkeypatch.setattr(ac, "_get_multi_slicer", counting_ms)
    out = start_copy(tree, pack_candidate_max_bytes=32 << 20).get()
    # 2 dtout chunks with payload (uint8 incl. the 700 KB fields, int32) +
    # int16/uint32 leaves are ALL empty -> constants, no chunk of their own
    assert puts["n"] == 2, puts
    assert slicer_execs["n"] == 1
    for o, src in zip(out, tree):
        np.testing.assert_array_equal(np.asarray(o), src)
        assert np.asarray(o).dtype == src.dtype


def test_all_empty_tree_fallback():
    """A tree whose packable leaves are all zero-size still transfers."""
    tree = [np.zeros((0,), np.float32), np.zeros((3, 0), np.uint8), "opaque"]
    out = start_copy(tree).get()
    assert np.asarray(out[0]).shape == (0,)
    assert np.asarray(out[1]).shape == (3, 0)
    assert out[2] == "opaque"


def test_merged_byte_chunk_mode(monkeypatch):
    """merge_dtype_chunks: every int/uint/float field rides ONE raw-byte
    chunk (re-typed device-side via bitcast) — 1 transfer + 1 dispatch for
    a mixed-dtype tree; bool/complex fall back to per-dtype chunks."""
    import jax

    from accvlab_tpu.hostcopy import async_copy as ac

    rng = np.random.default_rng(3)
    tree = (
        [rng.integers(0, 255, (400_000,), np.uint8)]
        + [rng.normal(size=(17, 3)).astype(np.float32) for _ in range(6)]
        + [rng.integers(-999, 999, (13,)).astype(np.int16) for _ in range(4)]
        + [rng.integers(0, 2**31, (7,)).astype(np.uint32) for _ in range(2)]
        + [np.zeros((0,), np.int32), np.zeros((5, 0), np.float32)]
    )
    puts = {"n": 0}
    orig_put = jax.device_put

    def counting_put(x, device=None, **kw):
        puts["n"] += 1
        return orig_put(x, device, **kw)

    monkeypatch.setattr(jax, "device_put", counting_put)
    execs = {"n": 0}
    orig_bs = ac._get_byte_slicer

    def counting_bs(spec):
        fn = orig_bs(spec)

        def wrapped(*chunks):
            execs["n"] += 1
            return fn(*chunks)

        return wrapped

    monkeypatch.setattr(ac, "_get_byte_slicer", counting_bs)
    out = start_copy(
        tree, pack_candidate_max_bytes=32 << 20, merge_dtype_chunks=True
    ).get()
    assert puts["n"] == 1, puts
    assert execs["n"] == 1
    for o, src in zip(out, tree):
        a = np.asarray(o)
        np.testing.assert_array_equal(a, src)
        assert a.dtype == src.dtype

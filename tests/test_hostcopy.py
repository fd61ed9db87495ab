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

"""Differential parity vs the REFERENCE's own pure-torch implementations.

The strongest parity oracle available: instead of re-deriving expected
values, randomized inputs run through BOTH this package's jnp ops and the
reference's actual torch code (`/root/reference/packages/batching_helpers`,
whose bool-indexing/reductions/compaction/combination paths are pure
Python+torch). The reference imports its CUDA/CPU extension modules at
package import; the fixture stubs them with a 6-line pure-torch
implementation of the ONE function those paths call
(`set_ragged_batch_padded_to_filler_value_in_place`, contract at
`set_padded_to.py:26-33`: set positions >= sample_size along dim 1 to the
filler) — no kernels are needed for the ops compared here.

Padded regions are intentionally filled with garbage on both sides:
agreement is asserted on valid elements and sample sizes only (padding
content is an implementation detail in both frameworks).

Skipped wholesale when the reference checkout is absent (the suite stays
standalone).
"""

import os
import sys
import types

import numpy as np
import pytest

_REF_PKG = "/root/reference/packages/batching_helpers"
if not os.path.isdir(_REF_PKG):  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)

torch = pytest.importorskip("torch")

import jax.numpy as jnp

import accvlab_tpu.ragged as ours


@pytest.fixture(scope="module")
def ref():
    def _set_padded(data, sample_sizes, value):
        # contract (set_padded_to.py:26-33 + ragged_batch.py:552-558): data
        # arrives with the non-uniform dim right after the batch dims, i.e.
        # data (B..., T, inner...) with sample_sizes (B...,)
        nb = sample_sizes.dim()
        t = data.shape[nb]
        idx = torch.arange(t, device=data.device).reshape((1,) * nb + (t,))
        data[idx >= sample_sizes[..., None]] = value

    for name in ("batched_indexing_access_cuda", "batched_indexing_access_cpu"):
        mod = types.ModuleType(f"accvlab.batching_helpers.{name}")
        mod.set_ragged_batch_padded_to_filler_value_in_place = _set_padded
        sys.modules[f"accvlab.batching_helpers.{name}"] = mod
    sys.path.insert(0, _REF_PKG)
    import accvlab.batching_helpers as bh

    return bh


def _ragged_pair(ref, rng, b=3, t=6, inner=(), allow_empty=True):
    """The same random ragged batch in both frameworks (padding garbage)."""
    data = rng.normal(size=(b, t, *inner)).astype(np.float32)
    lo = 0 if allow_empty else 1
    sizes = rng.integers(lo, t + 1, b).astype(np.int64)
    theirs = ref.RaggedBatch(
        torch.from_numpy(data.copy()), sample_sizes=torch.from_numpy(sizes)
    )
    mine = ours.RaggedBatch(
        jnp.asarray(data), sample_sizes=jnp.asarray(sizes.astype(np.int32))
    )
    return mine, theirs, data, sizes


def _assert_ragged_equal(mine, theirs, atol=1e-6):
    """Valid-region + size equality between our RaggedBatch and theirs."""
    ts = theirs.sample_sizes.numpy()
    ms = np.asarray(mine.sample_sizes)
    np.testing.assert_array_equal(ms, ts)
    tt = theirs.tensor.numpy()
    mt = np.asarray(mine.tensor)
    for i, n in enumerate(ts):
        np.testing.assert_allclose(
            mt[i, : int(n)], tt[i, : int(n)], atol=atol, err_msg=f"sample {i}"
        )


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("inner", [(), (4,)])
def test_reductions_match_reference(ref, seed, inner):
    rng = np.random.default_rng(seed)
    mine, theirs, _, _ = _ragged_pair(ref, rng, inner=inner, allow_empty=True)
    np.testing.assert_allclose(
        np.asarray(ours.average_over_targets(mine)),
        ref.average_over_targets(theirs).numpy(),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ours.sum_over_targets(mine)),
        ref.sum_over_targets(theirs).numpy(),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_bool_indexing_ragged_data_ragged_mask(ref, seed):
    rng = np.random.default_rng(10 + seed)
    mine, theirs, data, sizes = _ragged_pair(ref, rng, inner=(3,), allow_empty=False)
    mask = rng.integers(0, 2, data.shape[:2]).astype(bool)
    t_mask = ref.RaggedBatch(
        torch.from_numpy(mask.copy()), sample_sizes=torch.from_numpy(sizes)
    )
    m_mask = ours.RaggedBatch(
        jnp.asarray(mask), sample_sizes=jnp.asarray(sizes.astype(np.int32))
    )
    want = ref.batched_bool_indexing(theirs, t_mask)
    got = ours.batched_bool_indexing(mine, m_mask)
    _assert_ragged_equal(got, want)


@pytest.mark.parametrize("seed", [0, 1])
def test_bool_indexing_tensor_data_ragged_mask(ref, seed):
    rng = np.random.default_rng(20 + seed)
    b, t = 3, 5
    data = rng.normal(size=(b, t, 2)).astype(np.float32)
    mask = rng.integers(0, 2, (b, t)).astype(bool)
    sizes = rng.integers(1, t + 1, b).astype(np.int64)
    want = ref.batched_bool_indexing(
        torch.from_numpy(data.copy()),
        ref.RaggedBatch(torch.from_numpy(mask.copy()),
                        sample_sizes=torch.from_numpy(sizes)),
    )
    got = ours.batched_bool_indexing(
        jnp.asarray(data),
        ours.RaggedBatch(jnp.asarray(mask),
                         sample_sizes=jnp.asarray(sizes.astype(np.int32))),
    )
    _assert_ragged_equal(got, want)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_get_compact_lists_matches_reference(ref, seed):
    rng = np.random.default_rng(30 + seed)
    b, t = 4, 7
    mask = rng.integers(0, 2, (b, t)).astype(bool)
    d1 = rng.normal(size=(b, t)).astype(np.float32)
    d2 = rng.normal(size=(b, t, 3)).astype(np.float32)
    want = ref.get_compact_lists(
        torch.from_numpy(mask.copy()),
        [torch.from_numpy(d1.copy()), torch.from_numpy(d2.copy()), "tag"],
    )
    got = ours.get_compact_lists(jnp.asarray(mask), [jnp.asarray(d1), jnp.asarray(d2), "tag"])
    assert want[2] == got[2] == "tag"
    # the reference unsqueezes 1-D data to (b, t, 1); compare valid regions
    for w, g in zip(want[:2], got[:2]):
        ws = w.sample_sizes.numpy()
        np.testing.assert_array_equal(np.asarray(g.sample_sizes), ws)
        wt = w.tensor.numpy()
        gt = np.asarray(g.tensor).reshape(wt.shape[0], wt.shape[1], *wt.shape[2:])
        for i, n in enumerate(ws):
            np.testing.assert_allclose(gt[i, : int(n)], wt[i, : int(n)], atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_combine_data_matches_reference(ref, seed):
    rng = np.random.default_rng(40 + seed)
    pieces = [
        rng.normal(size=(int(n), 3)).astype(np.float32)
        for n in rng.integers(0, 6, 4)
    ]
    want = ref.combine_data([torch.from_numpy(p.copy()) for p in pieces])
    got = ours.combine_data([jnp.asarray(p) for p in pieces])
    _assert_ragged_equal(got, want)


@pytest.mark.parametrize("seed", [0, 1])
def test_get_indices_from_mask_matches_reference(ref, seed):
    rng = np.random.default_rng(50 + seed)
    mask = rng.integers(0, 2, (3, 8)).astype(bool)
    want = ref.get_indices_from_mask(torch.from_numpy(mask.copy()))
    got = ours.get_indices_from_mask(jnp.asarray(mask))
    ws = want.sample_sizes.numpy()
    np.testing.assert_array_equal(np.asarray(got.sample_sizes), ws)
    wt = want.tensor.numpy()
    gt = np.asarray(got.tensor).reshape(wt.shape)
    for i, n in enumerate(ws):
        np.testing.assert_array_equal(gt[i, : int(n)], wt[i, : int(n)])


@pytest.mark.parametrize("seed", [0, 1])
def test_ragged_batch_methods_match_reference(ref, seed):
    rng = np.random.default_rng(60 + seed)
    mine, theirs, _, sizes = _ragged_pair(ref, rng, inner=(2,), allow_empty=True)
    # mask derivation
    np.testing.assert_array_equal(
        np.asarray(mine.mask), theirs.mask.numpy()
    )
    # existence weights
    np.testing.assert_allclose(
        np.asarray(mine.get_existence_weights()),
        theirs.get_existence_weights().numpy(),
        rtol=1e-6,
    )
    # per-sample split
    w_split = theirs.split()
    g_split = mine.split()
    assert len(w_split) == len(g_split)
    for w, g in zip(w_split, g_split):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), atol=1e-6)
    # repeat_samples (the reference requires an explicit batch_dim)
    w_rep = theirs.repeat_samples(3, batch_dim=0)
    g_rep = mine.repeat_samples(3, batch_dim=0)
    _assert_ragged_equal(g_rep, w_rep)


def test_set_padded_to_matches_reference(ref):
    rng = np.random.default_rng(70)
    mine, theirs, _, _ = _ragged_pair(ref, rng, inner=(2,), allow_empty=True)
    want = theirs.set_padded_to(-5.0)  # in-place via the stubbed contract
    got = mine.with_padded_set_to(-5.0)
    np.testing.assert_allclose(
        np.asarray(got.tensor), theirs.tensor.numpy(), atol=1e-6
    )


def _normalized(t_rb=None, o_rb=None):
    """Whole-tensor comparison after normalizing padding to 0 on both sides
    (padding content is an implementation detail; zeroing it via each
    framework's own set_padded_to makes full tensors comparable)."""
    t_rb.set_padded_to(0.0)  # the reference mutates in place (returns None)
    wt = t_rb.tensor.numpy()
    gt = np.asarray(o_rb.with_padded_set_to(0.0).tensor)
    return wt, gt


@pytest.mark.parametrize("seed", [0, 1])
def test_oversize_constructor_matches_reference(ref, seed):
    rng = np.random.default_rng(80 + seed)
    data = rng.normal(size=(3, 10, 2)).astype(np.float32)
    sizes = rng.integers(0, 7, 3).astype(np.int64)
    w = ref.RaggedBatch.FromOversizeTensor(
        torch.from_numpy(data.copy()), sample_sizes=torch.from_numpy(sizes)
    )
    g = ours.RaggedBatch.FromOversizeTensor(
        jnp.asarray(data), sample_sizes=jnp.asarray(sizes.astype(np.int32))
    )
    assert tuple(g.tensor.shape) == tuple(w.tensor.shape)  # same truncation
    np.testing.assert_array_equal(np.asarray(g.mask), w.mask.numpy())
    wt, gt = _normalized(w, g)
    np.testing.assert_allclose(gt, wt, atol=1e-6)

    # mask-variant: sizes derived from the mask (contiguous-prefix mask)
    mask = np.arange(10)[None, :] < sizes[:, None]
    w2 = ref.RaggedBatch.FromOversizeTensor(
        torch.from_numpy(data.copy()), mask=torch.from_numpy(mask.copy())
    )
    g2 = ours.RaggedBatch.FromOversizeTensor(
        jnp.asarray(data), mask=jnp.asarray(mask)
    )
    np.testing.assert_array_equal(
        np.asarray(g2.sample_sizes), w2.sample_sizes.numpy()
    )
    assert tuple(g2.tensor.shape) == tuple(w2.tensor.shape)


@pytest.mark.parametrize("seed", [0, 1])
def test_multi_batch_dim_transforms_match_reference(ref, seed):
    rng = np.random.default_rng(90 + seed)
    data = rng.normal(size=(2, 3, 5, 2)).astype(np.float32)
    sizes = rng.integers(0, 6, (2, 3)).astype(np.int64)
    w = ref.RaggedBatch(
        torch.from_numpy(data.copy()),
        sample_sizes=torch.from_numpy(sizes),
        non_uniform_dim=2,
    )
    g = ours.RaggedBatch(
        jnp.asarray(data),
        sample_sizes=jnp.asarray(sizes.astype(np.int32)),
        non_uniform_dim=2,
    )
    # flatten -> reshape roundtrip
    wf, gf = w.flatten_batch_dims(), g.flatten_batch_dims()
    np.testing.assert_array_equal(
        np.asarray(gf.sample_sizes), wf.sample_sizes.numpy()
    )
    wt, gt = _normalized(wf, gf)
    np.testing.assert_allclose(gt, wt, atol=1e-6)
    wr, gr = wf.reshape_batch_dims((2, 3)), gf.reshape_batch_dims((2, 3))
    wt, gt = _normalized(wr, gr)
    np.testing.assert_allclose(gt, wt, atol=1e-6)
    # unsqueeze / squeeze roundtrip
    wu, gu = w.unsqueeze_batch_dim(1), g.unsqueeze_batch_dim(1)
    assert tuple(gu.tensor.shape) == tuple(wu.tensor.shape)
    ws, gs = wu.squeeze_batch_dim(1), gu.squeeze_batch_dim(1)
    wt, gt = _normalized(ws, gs)
    np.testing.assert_allclose(gt, wt, atol=1e-6)
    # transpose the non-uniform dimension
    wtr = w.get_non_uniform_dimension_transposed_to(3)
    gtr = g.get_non_uniform_dimension_transposed_to(3)
    assert wtr.non_uniform_dim == gtr.non_uniform_dim == 3
    wt, gt = _normalized(wtr, gtr)
    np.testing.assert_allclose(gt, wt, atol=1e-6)
    # apply (functional map over the padded tensor)
    wa = w.apply(lambda t: t * 2.0 + 1.0)
    ga = g.apply(lambda t: t * 2.0 + 1.0)
    wt, gt = _normalized(wa, ga)
    np.testing.assert_allclose(gt, wt, atol=1e-6)


def test_broadcast_batch_dims_matches_reference(ref):
    rng = np.random.default_rng(101)
    d1 = rng.normal(size=(2, 1, 4, 2)).astype(np.float32)
    s1 = rng.integers(0, 5, (2, 1)).astype(np.int64)
    d2 = rng.normal(size=(1, 3, 4, 2)).astype(np.float32)
    s2 = rng.integers(0, 5, (1, 3)).astype(np.int64)
    w_out = ref.RaggedBatch.broadcast_batch_dims([
        ref.RaggedBatch(torch.from_numpy(d1.copy()),
                        sample_sizes=torch.from_numpy(s1), non_uniform_dim=2),
        ref.RaggedBatch(torch.from_numpy(d2.copy()),
                        sample_sizes=torch.from_numpy(s2), non_uniform_dim=2),
    ])
    g_out = ours.RaggedBatch.broadcast_batch_dims([
        ours.RaggedBatch(jnp.asarray(d1),
                         sample_sizes=jnp.asarray(s1.astype(np.int32)),
                         non_uniform_dim=2),
        ours.RaggedBatch(jnp.asarray(d2),
                         sample_sizes=jnp.asarray(s2.astype(np.int32)),
                         non_uniform_dim=2),
    ])
    for w, g in zip(w_out, g_out):
        assert tuple(g.tensor.shape) == tuple(w.tensor.shape)
        np.testing.assert_array_equal(
            np.asarray(g.sample_sizes), w.sample_sizes.numpy()
        )
        wt, gt = _normalized(w, g)
        np.testing.assert_allclose(gt, wt, atol=1e-6)


# --------------------------------------------------------------------------- #
# input-sharding contract (dali_pipeline_framework inputs)
# --------------------------------------------------------------------------- #

_REF_INPUTS = (
    "/root/reference/packages/dali_pipeline_framework/accvlab/"
    "dali_pipeline_framework/inputs"
)


@pytest.fixture(scope="module")
def ref_sharded_callable():
    """Load the reference's ShuffledShardedInputCallable from source with
    its DALI/package context stubbed (the sharding algorithm itself is
    pure numpy — SURVEY: 'the sharding contract IS the algorithm')."""
    import importlib.util

    dali = types.ModuleType("nvidia.dali")
    dali.types = types.SimpleNamespace(SampleInfo=object)
    nvidia = types.ModuleType("nvidia")
    nvidia.dali = dali
    pkg = types.ModuleType("refdpf")
    pkg.__path__ = []
    inputs_pkg = types.ModuleType("refdpf.inputs")
    inputs_pkg.__path__ = [_REF_INPUTS]
    pipeline_stub = types.ModuleType("refdpf.pipeline")
    pipeline_stub.SampleDataGroup = object
    cb = types.ModuleType("refdpf.inputs.callable_base")

    class _CallableBase:
        pass

    cb.CallableBase = _CallableBase
    dp = types.ModuleType("refdpf.inputs.data_provider")
    dp.DataProvider = object
    sys.modules.update({
        "nvidia": nvidia,
        "nvidia.dali": dali,
        "refdpf": pkg,
        "refdpf.inputs": inputs_pkg,
        "refdpf.pipeline": pipeline_stub,
        "refdpf.inputs.callable_base": cb,
        "refdpf.inputs.data_provider": dp,
    })
    name = "refdpf.inputs.sfuffled_sharded_input_callable"
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REF_INPUTS, "sfuffled_sharded_input_callable.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod.ShuffledShardedInputCallable


class _RefRecordingProvider:
    """Provider for the reference callable: records requested indices."""

    def __init__(self, n):
        self.n = n
        self.requests = []

    def get_number_of_samples(self):
        return self.n

    def get_data(self, idx):
        self.requests.append(int(idx))
        outer = self

        class _S:
            def get_data(self):
                return (np.int32(0),)

        return _S()


def _our_index_stream(n, batch_size, shard_id, num_shards, shuffle, seed, epochs):
    from accvlab_tpu.pipeline import DType, SampleDataGroup
    from accvlab_tpu.pipeline.inputs import (
        DataProvider,
        SampleInfo,
        ShuffledShardedInputCallable,
    )

    requests = []

    class _P(DataProvider):
        @property
        def sample_data_structure(self):
            sdg = SampleDataGroup()
            sdg.add_data_field("x", DType.INT32)
            return sdg

        def get_number_of_samples(self):
            return n

        def get_data(self, idx):
            requests.append(int(idx))
            sdg = self.sample_data_structure
            sdg["x"] = np.int32(0)
            return sdg

    inp = ShuffledShardedInputCallable(
        _P(), batch_size=batch_size, shard_id=shard_id, num_shards=num_shards,
        shuffle=shuffle, seed=seed,
    )
    shard_size = n // num_shards
    for epoch in range(epochs):
        for i in range(shard_size):
            inp(SampleInfo(idx_in_epoch=i, idx_in_batch=i % batch_size,
                           iteration=i // batch_size, epoch_idx=epoch))
    # the epoch boundary must StopIteration in both
    with pytest.raises(StopIteration):
        inp(SampleInfo(idx_in_epoch=shard_size, idx_in_batch=0,
                       iteration=shard_size // batch_size, epoch_idx=epochs - 1))
    return requests, inp.length


@pytest.mark.parametrize("shuffle", [False, True])
@pytest.mark.parametrize("num_shards", [1, 2, 3])
def test_sharded_input_index_stream_matches_reference(
    ref_sharded_callable, shuffle, num_shards
):
    """Bitwise agreement of the multi-host input contract: for every
    (shard, epoch) the exact per-sample index stream, the epoch length,
    and the StopIteration boundary."""
    n, batch_size, seed, epochs = 20, 2, 21, 3
    for shard_id in range(num_shards):
        prov = _RefRecordingProvider(n)
        ref_inp = ref_sharded_callable(
            prov, batch_size=batch_size, shard_id=shard_id,
            num_shards=num_shards, shuffle=shuffle, seed=seed,
        )
        shard_size = n // num_shards
        for epoch in range(epochs):
            for i in range(shard_size):
                ref_inp(types.SimpleNamespace(idx_in_epoch=i, epoch_idx=epoch))
        with pytest.raises(StopIteration):
            ref_inp(types.SimpleNamespace(idx_in_epoch=shard_size,
                                          epoch_idx=epochs - 1))

        got, got_len = _our_index_stream(
            n, batch_size, shard_id, num_shards, shuffle, seed, epochs
        )
        assert got == prov.requests, (
            f"index stream diverged (shard {shard_id}/{num_shards}, "
            f"shuffle={shuffle})"
        )
        assert got_len == ref_inp.length


# --------------------------------------------------------------------------- #
# condition-DSL grammar (internal_helpers/mini_parser)
# --------------------------------------------------------------------------- #

_REF_MP = (
    "/root/reference/packages/dali_pipeline_framework/accvlab/"
    "dali_pipeline_framework/internal_helpers/mini_parser"
)


@pytest.fixture(scope="module")
def ref_mini_parser():
    """The reference's parser package is self-contained pure Python."""
    import importlib.util

    name = "ref_mini_parser"
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REF_MP, "__init__.py"),
        submodule_search_locations=[_REF_MP],
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _canon_ast(node):
    """Framework-agnostic structural form (both ASTs share the node
    vocabulary and attribute names — the parity surface)."""
    t = type(node).__name__
    if t == "Assignment":
        return ("assign", _canon_ast(node.variable), _canon_ast(node.expression))
    if t == "Literal":
        return ("lit", float(node.value))
    if t == "Variable":
        return ("var", node.name)
    if t == "Comparison":
        return ("cmp", node.comparison_type,
                _canon_ast(node.val1), _canon_ast(node.val2))
    if t in ("Or", "And"):
        # associativity encoding differs (this package builds one n-ary
        # node for a chain, the reference nests left-associatively) and is
        # semantically irrelevant for and/or: canonical form flattens
        # same-type chains so the differential compares precedence and
        # grouping, not the chain encoding
        kids = []
        for c in node.conditions:
            cc = _canon_ast(c)
            if cc[0] == t.lower():
                kids.extend(cc[1])
            else:
                kids.append(cc)
        return (t.lower(), tuple(kids))
    if t == "Not":
        return ("not", _canon_ast(node.condition))
    if t == "UnaryMinus":
        return ("neg", _canon_ast(node.value))
    raise TypeError(f"unknown AST node {t}")


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_mini_parser_ast_matches_reference(ref_mini_parser, seed):
    """Grammar differential: random condition strings must parse to the
    SAME structure in both parsers (precedence, associativity, grouping —
    incl. the reference's not-binds-tighter-than-comparison deviation)."""
    from accvlab_tpu.pipeline.mini_parser import Parser as OurParser
    from tests.test_mini_parser_fuzz import _gen_bool

    rng = np.random.default_rng(200 + seed)
    names = ["aa", "bb", "cc"]
    for _ in range(25):
        text = f"res = {_gen_bool(rng, names, 0)}"
        want = _canon_ast(ref_mini_parser.Parser(text).parse())
        got = _canon_ast(OurParser(text).parse())
        assert got == want, text


def test_mini_parser_hand_cases_match_reference(ref_mini_parser):
    from accvlab_tpu.pipeline.mini_parser import Parser as OurParser

    for text in [
        "r = a > 1.5 and b < 2.0 or not c == 0.0",
        "r = not a > 1.0",             # the precedence deviation
        "r = -a <= (-1.25)",
        "r = (a > 0.0 or b > 0.0) and (not (c < 1.0))",
        "r = a != b and a != c and b != c",
    ]:
        assert _canon_ast(OurParser(text).parse()) == _canon_ast(
            ref_mini_parser.Parser(text).parse()
        ), text

"""Cross-validation of polyline interpolation against an independent oracle.

Mirrors the reference's Shapely evaluation
(``lane_helpers/evaluation/shapely_evaluation.py:87-99,286-340``): random
polylines in the unit square, query distances drawn as fractions of each
polyline's length, results asserted within ``atol=1e-3`` (the reference's
``DEFAULT_ASSERT_ATOL``).

Shapely is not installed in this environment, so the oracle here is an
independent re-implementation of GEOS's ``interpolate`` algorithm
(LengthIndexedLine): a SCALAR float64 walk over segments — accumulate
segment lengths one by one until the target distance falls inside a
segment, then linearly interpolate within it. This shares no code or
algorithmic structure with the library path (vectorized f32
cumsum + searchsorted + gather) and uses higher precision, so agreement is
meaningful. When shapely IS importable the same cases are additionally
checked against the real ``line_interpolate_point``.
"""

import math

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from accvlab_tpu.polyline import interpolate, interpolate_var_size_batch, lengths
from accvlab_tpu.ragged import RaggedBatch

ATOL = 1e-3  # reference DEFAULT_ASSERT_ATOL (shapely_evaluation.py:55)

try:
    import shapely  # noqa: F401

    HAVE_SHAPELY = True
except ImportError:
    HAVE_SHAPELY = False


def geos_interpolate_point(line, distance):
    """Scalar float64 walk — GEOS LengthIndexedLine.extractPoint semantics
    for 0 <= distance (clamps to the last vertex past the end)."""
    if distance <= 0.0:
        return tuple(float(c) for c in line[0])
    walked = 0.0
    for i in range(len(line) - 1):
        p0 = line[i]
        p1 = line[i + 1]
        seg = math.dist(p0, p1)
        if walked + seg >= distance and seg > 0.0:
            frac = (distance - walked) / seg
            return tuple(float(a) + frac * (float(b) - float(a)) for a, b in zip(p0, p1))
        walked += seg
    return tuple(float(c) for c in line[-1])


def geos_reference(points, distances):
    """(B, N, D) float points, (B, Q) distances -> (B, Q, D) float64."""
    b, _, d = points.shape
    out = np.zeros((b, distances.shape[1], d), np.float64)
    for s in range(b):
        line = [tuple(float(c) for c in p) for p in np.asarray(points[s], np.float64)]
        for q, dist in enumerate(np.asarray(distances[s], np.float64)):
            out[s, q] = geos_interpolate_point(line, float(dist))
    return out


def make_case(batch, n_points, n_dists, seed):
    # reference case generation (shapely_evaluation.py:135-149)
    gen = np.random.default_rng(seed=seed)
    points = gen.uniform(0.0, 1.0, size=(batch, n_points, 2)).astype(np.float32)
    seg = np.linalg.norm(points[:, 1:] - points[:, :-1], axis=2)
    total = seg.sum(axis=1).astype(np.float32)
    dist = (gen.uniform(0.0, 1.0, size=(batch, n_dists)).astype(np.float32) * total[:, None])
    return points, dist


SWEEP = [
    (1, 2, 5),
    (4, 5, 20),
    (4, 50, 50),
    (16, 100, 10),
    (8, 200, 100),
    (2, 1000, 200),
]


@pytest.mark.parametrize("batch,n_points,n_dists", SWEEP)
def test_interpolate_matches_independent_geos_oracle(batch, n_points, n_dists):
    seed = batch * 1_000_000 + n_points * 1_000 + n_dists
    points, dist = make_case(batch, n_points, n_dists, seed)
    got = np.asarray(interpolate(jnp.asarray(points), jnp.asarray(dist)))
    want = geos_reference(points, dist)
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=0.0)


@pytest.mark.parametrize("batch,n_points,n_dists", SWEEP[:4])
def test_var_size_batch_matches_independent_geos_oracle(batch, n_points, n_dists):
    seed = batch * 7_000_000 + n_points * 1_000 + n_dists
    gen = np.random.default_rng(seed)
    points, dist = make_case(batch, n_points, n_dists, seed)
    sizes_p = gen.integers(2, n_points + 1, size=(batch,))
    sizes_d = gen.integers(1, n_dists + 1, size=(batch,))
    # re-derive distances from the VALID prefix length so queries stay in range
    for s in range(batch):
        seg = np.linalg.norm(np.diff(points[s, : sizes_p[s]], axis=0), axis=1)
        dist[s] = (gen.uniform(0.0, 1.0, n_dists) * seg.sum()).astype(np.float32)
    pb = RaggedBatch(jnp.asarray(points), sample_sizes=jnp.asarray(sizes_p))
    db = RaggedBatch(jnp.asarray(dist), sample_sizes=jnp.asarray(sizes_d))
    got = np.asarray(interpolate_var_size_batch(pb, db).tensor)
    for s in range(batch):
        want = geos_reference(
            points[None, s, : sizes_p[s]], dist[None, s, : sizes_d[s]]
        )[0]
        np.testing.assert_allclose(got[s, : sizes_d[s]], want, atol=ATOL, rtol=0.0)


def test_lengths_match_scalar_walk():
    points, _ = make_case(8, 300, 1, seed=42)
    got = np.asarray(lengths(jnp.asarray(points)))
    want = np.array(
        [sum(math.dist(line[i], line[i + 1]) for i in range(len(line) - 1))
         for line in [list(map(tuple, p.astype(np.float64))) for p in points]]
    )
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=0.0)


def vendored_geos_interpolate(points, distances):
    """Vendored float64 VECTORIZED restatement of GEOS LengthIndexedLine
    (the ~30 lines of shapely ``line_interpolate_point`` logic the reference
    evaluation needs, ``shapely_evaluation.py:87-99``): cumulative segment
    lengths + searchsorted + lerp, all in float64 numpy. A third independent
    code path — distinct from both the scalar f64 walk above and the
    library's vectorized f32 jax path."""
    pts = np.asarray(points, np.float64)
    d = np.asarray(distances, np.float64)
    seg = np.linalg.norm(np.diff(pts, axis=1), axis=2)  # (B, N-1)
    cum = np.concatenate(
        [np.zeros((pts.shape[0], 1)), np.cumsum(seg, axis=1)], axis=1
    )  # (B, N)
    total = cum[:, -1]
    dc = np.clip(d, 0.0, total[:, None])
    out = np.empty((pts.shape[0], d.shape[1], pts.shape[2]), np.float64)
    for s in range(pts.shape[0]):
        i = np.clip(
            np.searchsorted(cum[s, 1:], dc[s], side="left"), 0, seg.shape[1] - 1
        )
        seg_i = seg[s, i]
        # zero-length segment => p0 == p1; frac 0 picks the shared point
        frac = np.where(seg_i > 0, (dc[s] - cum[s, i]) / np.where(seg_i > 0, seg_i, 1.0), 0.0)
        out[s] = pts[s, i] + frac[:, None] * (pts[s, i + 1] - pts[s, i])
    return out


@pytest.mark.parametrize("batch,n_points,n_dists", SWEEP)
def test_interpolate_matches_shapely_or_vendored(batch, n_points, n_dists):
    """Real shapely when importable; otherwise the vendored float64
    line-interpolation above (same cases, never skipped — the reference bar
    is ``lane_helpers/evaluation/shapely_evaluation.py:286-340``)."""
    seed = batch * 1_000_000 + n_points * 1_000 + n_dists
    points, dist = make_case(batch, n_points, n_dists, seed)
    if HAVE_SHAPELY:
        from shapely import get_coordinates, line_interpolate_point, linestrings

        lines = linestrings(points)
        want = get_coordinates(line_interpolate_point(lines[:, None], dist)).reshape(
            batch, n_dists, 2
        )
    else:
        want = vendored_geos_interpolate(points, dist)
    got = np.asarray(interpolate(jnp.asarray(points), jnp.asarray(dist)))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=0.0)


@pytest.mark.parametrize("batch,n_points,n_dists", SWEEP[:3])
def test_vendored_oracle_agrees_with_scalar_walk(batch, n_points, n_dists):
    """The two independent float64 oracles must agree to near machine
    precision — guards the vendored implementation itself."""
    seed = batch * 3_000_000 + n_points * 1_000 + n_dists
    points, dist = make_case(batch, n_points, n_dists, seed)
    a = vendored_geos_interpolate(points, dist)
    b = geos_reference(points, dist)
    np.testing.assert_allclose(a, b, atol=1e-9, rtol=0.0)

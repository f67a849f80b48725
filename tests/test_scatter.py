"""Segment-reduce machinery vs NumPy, both backends."""

import numpy as np
import jax.numpy as jnp
import pytest

from gem_tpu.kernels import scatter


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    n, nseg = 4096, 257
    ids = rng.integers(0, nseg + 1, size=n)  # nseg == invalid marker
    vals = rng.normal(size=n).astype(np.float32)
    return ids.astype(np.int32), vals, nseg


@pytest.mark.parametrize("backend", ["segment", "sort"])
@pytest.mark.parametrize("kind,fill", [("sum", 0.0), ("min", np.inf),
                                       ("max", -np.inf)])
def test_segment_reduce_matches_numpy(data, backend, kind, fill):
    ids, vals, nseg = data
    got = np.asarray(scatter.segment_reduce(
        jnp.asarray(vals), jnp.asarray(ids), nseg, kind, fill,
        backend=backend))
    want = np.full(nseg, fill, np.float32)
    for s in range(nseg):
        sel = vals[ids == s]
        if len(sel):
            want[s] = {"sum": np.sum, "min": np.min, "max": np.max}[kind](sel)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("backend", ["segment", "sort"])
def test_segment_count(data, backend):
    ids, _, nseg = data
    got = np.asarray(scatter.segment_count(jnp.asarray(ids), nseg,
                                           backend=backend))
    want = np.bincount(ids[ids < nseg], minlength=nseg)
    np.testing.assert_array_equal(got, want)


def test_shared_sorted_segments_reused(data):
    ids, vals, nseg = data
    ss = scatter.SortedSegments(jnp.asarray(ids), nseg)
    a = np.asarray(scatter.segment_reduce(jnp.asarray(vals), jnp.asarray(ids),
                                          nseg, "sum", 0.0, backend="sort",
                                          ss=ss))
    b = np.asarray(scatter.segment_reduce(jnp.asarray(vals), jnp.asarray(ids),
                                          nseg, "sum", 0.0, backend="segment"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_all_invalid():
    ids = jnp.full((64,), 9, jnp.int32)
    out = np.asarray(scatter.segment_reduce(jnp.ones(64), ids, 9, "sum", 0.0,
                                            backend="sort"))
    assert (out == 0).all()

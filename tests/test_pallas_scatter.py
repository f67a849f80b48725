"""Pallas fused segment-stats kernel vs NumPy (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gem_tpu.kernels.pallas_scatter import segment_stats


def _numpy_ref(ids, sv, mv, xv, S):
    sums = np.zeros((sv.shape[0], S), np.float32)
    mins = np.full((mv.shape[0], S), np.inf, np.float32)
    maxs = np.full((xv.shape[0], S), -np.inf, np.float32)
    for i, s in enumerate(ids):
        if s >= S:
            continue
        sums[:, s] += sv[:, i]
        mins[:, s] = np.minimum(mins[:, s], mv[:, i])
        maxs[:, s] = np.maximum(maxs[:, s], xv[:, i])
    return sums, mins, maxs


@pytest.mark.parametrize("clustered", [True, False])
def test_segment_stats_matches_numpy(clustered):
    rng = np.random.default_rng(0)
    n, S = 1024, 4096
    if clustered:
        # dense sorted-friendly ids (typical LiDAR frame)
        ids = np.sort(rng.integers(0, 600, n)).astype(np.int32)
    else:
        # scattered ids spanning the whole range (forces window spills)
        ids = rng.integers(0, S + 1, n).astype(np.int32)  # incl. invalid
    sv = rng.normal(size=(2, n)).astype(np.float32)
    mv = rng.normal(size=(2, n)).astype(np.float32)
    xv = rng.normal(size=(1, n)).astype(np.float32)

    sums, mins, maxs, n_spill = segment_stats(
        jnp.asarray(ids), jnp.asarray(sv), jnp.asarray(mv), jnp.asarray(xv),
        S, chunk=256, window=512, interpret=True)
    ref_s, ref_m, ref_x = _numpy_ref(ids, sv, mv, xv, S)
    np.testing.assert_allclose(np.asarray(sums), ref_s, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mins), ref_m, atol=1e-6)
    np.testing.assert_allclose(np.asarray(maxs), ref_x, atol=1e-6)
    if not clustered:
        assert int(n_spill) > 0   # the spill path actually exercised


def test_all_invalid():
    n, S = 256, 128
    ids = jnp.full((n,), S, jnp.int32)
    z = jnp.zeros((1, n))
    sums, mins, maxs, n_spill = segment_stats(ids, z, z, z, S, chunk=128,
                                              window=256, interpret=True)
    assert float(jnp.abs(sums).max()) == 0.0
    assert bool(jnp.isinf(mins).all())
    assert int(n_spill) == 0

"""Parity of the streaming Pallas fuse (kernels/fuse_stream.py) against the
XLA segment backend — same anchor-gated combine, overwrite-if-higher and
min-variance color semantics, plus the ride-along lowest bound."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gem_tpu.config import benchmark_config
from gem_tpu.core.state import init_map_state
from gem_tpu.kernels.fuse import fuse
from gem_tpu.kernels.fuse_stream import fuse_stream
from gem_tpu.kernels.pointproc import PointBatch


def _random_state(rng, mcfg, occupancy=0.5, start=(7, 29)):
    L = mcfg.length
    st = init_map_state(mcfg)
    elev = np.full((L, L), mcfg.invalid_elevation, np.float32)
    var = np.full((L, L), mcfg.invalid_variance, np.float32)
    occ = rng.random((L, L)) < occupancy
    elev[occ] = rng.normal(size=occ.sum()).astype(np.float32)
    var[occ] = rng.uniform(1e-4, 0.2, occ.sum()).astype(np.float32)
    return st.replace(elevation=jnp.asarray(elev), variance=jnp.asarray(var),
                      start=jnp.asarray(start, jnp.int32))


def _random_batch(rng, L, P, valid_frac=0.9, one_cell=None):
    if one_cell is not None:
        cell = np.full(P, one_cell, np.int32)
    else:
        cell = rng.integers(0, L * L, P).astype(np.int32)
    valid = rng.random(P) < valid_frac
    h = (rng.normal(size=P) * 2).astype(np.float32)
    v = rng.uniform(1e-4, 0.3, P).astype(np.float32)
    col = np.where(rng.random(P) < 0.6,
                   rng.integers(1, 1 << 24, P), 0).astype(np.int32)
    inten = np.where(col != 0, rng.uniform(0.1, 1.0, P),
                     0.0).astype(np.float32)
    return PointBatch(
        xy=jnp.zeros((P, 2)), height=jnp.asarray(h), variance=jnp.asarray(v),
        cell=jnp.where(jnp.asarray(valid), jnp.asarray(cell), L * L),
        color=jnp.asarray(col), intensity=jnp.asarray(inten),
        valid=jnp.asarray(valid))


def _compare(a, b, atol=5e-6):
    for k in ("elevation", "variance", "intensity"):
        x = np.asarray(getattr(a, k))
        y = np.asarray(getattr(b, k))
        assert np.abs(x - y).max() <= atol, (k, np.abs(x - y).max())
    assert np.array_equal(np.asarray(a.color), np.asarray(b.color))


@pytest.mark.parametrize("seed,occ,valid_frac", [(0, 0.5, 0.9),
                                                 (1, 0.0, 1.0),
                                                 (2, 1.0, 0.5)])
def test_stream_matches_segment(seed, occ, valid_frac):
    rng = np.random.default_rng(seed)
    L = 40
    cfg = benchmark_config(length=L, max_points=2048)
    st = _random_state(rng, cfg.map, occ)
    batch = _random_batch(rng, L, 2048, valid_frac)
    a = jax.jit(lambda s, b: fuse(s, cfg, b, backend="segment"))(st, batch)
    b = jax.jit(lambda s, b: fuse_stream(s, cfg, b, with_lowest=False,
                                         interpret=True))(st, batch)
    _compare(a, b)


def test_stream_all_points_one_cell():
    """Worst-case skew: the whole batch lands in a single cell (the kernel's
    inner chunk loop runs many chunks for one tile)."""
    rng = np.random.default_rng(3)
    L = 32
    cfg = benchmark_config(length=L, max_points=4096)
    st = _random_state(rng, cfg.map, 0.5)
    batch = _random_batch(rng, L, 4096, 0.95, one_cell=L * L // 2)
    a = jax.jit(lambda s, b: fuse(s, cfg, b, backend="segment"))(st, batch)
    b = jax.jit(lambda s, b: fuse_stream(s, cfg, b, with_lowest=False,
                                         interpret=True))(st, batch)
    _compare(a, b, atol=5e-5)   # 4k-term f32 sums reassociate


def test_stream_empty_batch_floors_variance():
    """No valid points: elevations unchanged, variance floored everywhere
    (gpu_process.cu:533-534 replication, same as the segment backend)."""
    rng = np.random.default_rng(4)
    L = 24
    cfg = benchmark_config(length=L, max_points=256)
    st = _random_state(rng, cfg.map, 0.5)
    batch = _random_batch(rng, L, 256, valid_frac=0.0)
    a = jax.jit(lambda s, b: fuse(s, cfg, b, backend="segment"))(st, batch)
    b = jax.jit(lambda s, b: fuse_stream(s, cfg, b, with_lowest=False,
                                         interpret=True))(st, batch)
    _compare(a, b)
    assert np.asarray(b.variance).min() >= cfg.map.min_variance


def test_stream_lowest_matches_pointproc_reduction():
    """The ride-along lowest (storage-space min + geographic roll) equals
    pointproc's direct geographic segment-min of h + 3*var."""
    from gem_tpu.kernels import scatter

    rng = np.random.default_rng(5)
    L = 40
    start = (13, 6)
    cfg = benchmark_config(length=L, max_points=2048)
    st = _random_state(rng, cfg.map, 0.3, start=start)
    batch = _random_batch(rng, L, 2048)

    out = jax.jit(lambda s, b: fuse_stream(s, cfg, b, with_lowest=True,
                                           interpret=True))(st, batch)

    # oracle: the reference atomicMin winner per geographic cell — the
    # min-height point (max-variance tie) contributes h + 3*variance (the
    # reference's heightVariance is a VARIANCE despite the sigma-sounding
    # name; gpu_process.cu:434-438, deterministic resolution)
    cell = np.asarray(batch.cell)
    valid = np.asarray(batch.valid) & (cell < L * L)
    sx, sy = cell // L, cell % L
    gx = (sx - start[0]) % L
    gy = (sy - start[1]) % L
    geo = np.where(valid, gx * L + gy, L * L)
    h = np.asarray(batch.height)
    var = np.asarray(batch.variance)
    want = np.full(L * L, np.inf, np.float32)
    for c in np.unique(geo[valid]):
        m = valid & (geo == c)
        hmin = h[m].min()
        vwin = var[m & (h == hmin)].max()
        want[c] = hmin + 3.0 * vwin
    want = jnp.minimum(st.lowest.reshape(-1), jnp.asarray(want)).reshape(L, L)
    np.testing.assert_allclose(np.asarray(out.lowest), np.asarray(want),
                               atol=1e-6)


def test_step_stream_matches_segment_end_to_end():
    """Whole pipeline steps with fuse_backend=stream_interpret track the
    segment backend across several frames (move, shed, features, raytrace
    identical; only the fuse/lowest path differs)."""
    import functools

    from gem_tpu.io.replay import synthetic_frames
    from gem_tpu.mapping.pipeline import init_pipeline_state, step

    cfg = benchmark_config(length=48, max_points=4096)
    fa = jax.jit(functools.partial(step, cfg=cfg, fuse_backend="segment"))
    fb = jax.jit(functools.partial(step, cfg=cfg,
                                   fuse_backend="stream_interpret"))
    sa = sb = init_pipeline_state(cfg)
    for frame, _, _ in synthetic_frames(cfg, 4, n_points=4096, speed=0.3,
                                        seed=0, max_range=2.4):
        sa, _ = fa(sa, frame)
        sb, _ = fb(sb, frame)
    ea, eb = np.asarray(sa.map.elevation), np.asarray(sb.map.elevation)
    occ_a, occ_b = ea != -10.0, eb != -10.0
    # fuse-order f32 noise can flip borderline gates on later frames; demand
    # near-total agreement, exact where both occupied
    assert (occ_a == occ_b).mean() > 0.999
    both = occ_a & occ_b
    assert np.abs(ea[both] - eb[both]).max() < 1e-3
    np.testing.assert_allclose(np.asarray(sa.map.lowest),
                               np.asarray(sb.map.lowest), atol=1e-5)


@pytest.mark.parametrize("color_mode", ["scan", "sweep"])
@pytest.mark.parametrize("seed,occ,valid_frac", [(0, 0.5, 0.9),
                                                 (2, 1.0, 0.5)])
def test_stream_color_modes_match_segment(monkeypatch, color_mode, seed,
                                          occ, valid_frac):
    """Both color argmin mechanisms must match the segment oracle: the
    segmented rolled min-scan (default) and the dense (CHUNK, TILE)
    min-sweep (GEM_FUSE_COLOR=sweep, the documented A/B fallback) — min-v
    inlier color with independent payload min at exact v ties.  The sweep
    leg exists so flipping the default to scan doesn't silently drop all
    coverage of the sweep branch."""
    import gem_tpu.kernels.fuse_stream as fs

    monkeypatch.setattr(fs, "_COLOR", color_mode)
    rng = np.random.default_rng(seed)
    L = 40
    cfg = benchmark_config(length=L, max_points=2048)
    st = _random_state(rng, cfg.map, occ)
    batch = _random_batch(rng, L, 2048, valid_frac)
    a = jax.jit(lambda s, b: fuse(s, cfg, b, backend="segment"))(st, batch)
    b = jax.jit(lambda s, b: fs.fuse_stream(s, cfg, b, with_lowest=False,
                                            interpret=True))(st, batch)
    _compare(a, b)


@pytest.mark.parametrize("color_mode", ["scan", "sweep"])
def test_stream_color_one_cell(monkeypatch, color_mode):
    """Color paths under worst-case skew: one cell spans many chunks, so
    cross-chunk partial-min combining (incl. exact-tie payload union) is
    exercised, in both scan and sweep modes."""
    import gem_tpu.kernels.fuse_stream as fs

    monkeypatch.setattr(fs, "_COLOR", color_mode)
    rng = np.random.default_rng(3)
    L = 32
    cfg = benchmark_config(length=L, max_points=4096)
    st = _random_state(rng, cfg.map, 0.5)
    batch = _random_batch(rng, L, 4096, 0.95, one_cell=L * L // 2)
    a = jax.jit(lambda s, b: fuse(s, cfg, b, backend="segment"))(st, batch)
    b = jax.jit(lambda s, b: fs.fuse_stream(s, cfg, b, with_lowest=False,
                                            interpret=True))(st, batch)
    _compare(a, b, atol=5e-5)


@pytest.mark.parametrize("seed,occ,valid_frac", [(0, 0.5, 0.9),
                                                 (1, 0.0, 1.0),
                                                 (2, 1.0, 0.5)])
def test_stream_passa_gather_matches_segment(monkeypatch, seed, occ,
                                             valid_frac):
    """GEM_FUSE_PASSA=gather variant: the per-point VMEM take_along_axis
    anchor must reproduce the one-hot-dot pass-A exactly — same prior
    reads, same empty/overwrite/Kalman gating (interpret mode; the on-chip
    Mosaic lowering is A/B'd by bench/round3.sh)."""
    import gem_tpu.kernels.fuse_stream as fs

    monkeypatch.setattr(fs, "_PASSA", "gather")
    rng = np.random.default_rng(seed)
    L = 40
    cfg = benchmark_config(length=L, max_points=2048)
    st = _random_state(rng, cfg.map, occ)
    batch = _random_batch(rng, L, 2048, valid_frac)
    a = jax.jit(lambda s, b: fuse(s, cfg, b, backend="segment"))(st, batch)
    b = jax.jit(lambda s, b: fs.fuse_stream(s, cfg, b, with_lowest=False,
                                            interpret=True))(st, batch)
    _compare(a, b)


def test_stream_passa_gather_one_cell_with_scan(monkeypatch):
    """gather pass-A combined with the scan color path under worst-case
    skew (the round3 step_1m_scan_gather configuration): clamped
    out-of-tile gather rows must stay inert across many chunks."""
    import gem_tpu.kernels.fuse_stream as fs

    monkeypatch.setattr(fs, "_PASSA", "gather")
    monkeypatch.setattr(fs, "_COLOR", "scan")
    rng = np.random.default_rng(3)
    L = 32
    cfg = benchmark_config(length=L, max_points=4096)
    st = _random_state(rng, cfg.map, 0.5)
    batch = _random_batch(rng, L, 4096, 0.95, one_cell=L * L // 2)
    a = jax.jit(lambda s, b: fuse(s, cfg, b, backend="segment"))(st, batch)
    b = jax.jit(lambda s, b: fs.fuse_stream(s, cfg, b, with_lowest=False,
                                            interpret=True))(st, batch)
    _compare(a, b, atol=5e-5)


@pytest.mark.parametrize("seed,occ,valid_frac", [(0, 0.5, 0.9),
                                                 (1, 0.0, 1.0),
                                                 (2, 1.0, 0.5)])
def test_stream_passa_scan_matches_segment(monkeypatch, seed, occ,
                                           valid_frac):
    """GEM_FUSE_PASSA=scan variant (round-4 single-dot kernel): the
    ride-along prior rows + in-kernel segmented anchor scan + fused
    15-column dot must reproduce the segment backend exactly, including
    the lowest bound (interpret mode; on-chip A/B via bench/round4b)."""
    import gem_tpu.kernels.fuse_stream as fs

    monkeypatch.setattr(fs, "_PASSA", "scan")
    rng = np.random.default_rng(seed)
    L = 40
    cfg = benchmark_config(length=L, max_points=2048)
    st = _random_state(rng, cfg.map, occ)
    batch = _random_batch(rng, L, 2048, valid_frac)
    a = jax.jit(lambda s, b: fuse(s, cfg, b, backend="segment"))(st, batch)
    b = jax.jit(lambda s, b: fs.fuse_stream(s, cfg, b, with_lowest=False,
                                            interpret=True))(st, batch)
    _compare(a, b)


def test_stream_passa_scan_one_cell_carry(monkeypatch):
    """Worst-case skew for the scan kernel's cross-chunk carry: one cell's
    run spans many chunks, so every chunk after the first must take its
    anchor from the fori_loop carry, not the in-chunk scan."""
    import gem_tpu.kernels.fuse_stream as fs

    monkeypatch.setattr(fs, "_PASSA", "scan")
    rng = np.random.default_rng(3)
    L = 32
    cfg = benchmark_config(length=L, max_points=4096)
    st = _random_state(rng, cfg.map, 0.5)
    batch = _random_batch(rng, L, 4096, 0.95, one_cell=L * L // 2)
    a = jax.jit(lambda s, b: fuse(s, cfg, b, backend="segment"))(st, batch)
    b = jax.jit(lambda s, b: fs.fuse_stream(s, cfg, b, with_lowest=False,
                                            interpret=True))(st, batch)
    _compare(a, b, atol=5e-5)


@pytest.mark.parametrize("seed,occ,valid_frac", [(0, 0.5, 0.9),
                                                 (2, 1.0, 0.5)])
def test_stream_passa_scanp_matches_segment(monkeypatch, seed, occ,
                                            valid_frac):
    """GEM_FUSE_PASSA=scanp: the gather-free variant (prior via pass-A
    dot, anchor via segmented scan, single fused B dot) — exact parity
    with the segment backend."""
    import gem_tpu.kernels.fuse_stream as fs

    monkeypatch.setattr(fs, "_PASSA", "scanp")
    rng = np.random.default_rng(seed)
    L = 40
    cfg = benchmark_config(length=L, max_points=2048)
    st = _random_state(rng, cfg.map, occ)
    batch = _random_batch(rng, L, 2048, valid_frac)
    a = jax.jit(lambda s, b: fuse(s, cfg, b, backend="segment"))(st, batch)
    b = jax.jit(lambda s, b: fs.fuse_stream(s, cfg, b, with_lowest=False,
                                            interpret=True))(st, batch)
    _compare(a, b)


def test_stream_passa_scanp_one_cell_carry(monkeypatch):
    """scanp under the one-cell many-chunk skew (cross-chunk carry +
    out-of-tile zero-prior lanes must stay inert)."""
    import gem_tpu.kernels.fuse_stream as fs

    monkeypatch.setattr(fs, "_PASSA", "scanp")
    rng = np.random.default_rng(3)
    L = 32
    cfg = benchmark_config(length=L, max_points=4096)
    st = _random_state(rng, cfg.map, 0.5)
    batch = _random_batch(rng, L, 4096, 0.95, one_cell=L * L // 2)
    a = jax.jit(lambda s, b: fuse(s, cfg, b, backend="segment"))(st, batch)
    b = jax.jit(lambda s, b: fs.fuse_stream(s, cfg, b, with_lowest=False,
                                            interpret=True))(st, batch)
    _compare(a, b, atol=5e-5)


@pytest.mark.parametrize("seed,occ,valid_frac", [(0, 0.5, 0.9),
                                                 (1, 0.0, 1.0),
                                                 (2, 1.0, 0.5)])
def test_stream_passa_fact_matches_segment(monkeypatch, seed, occ,
                                           valid_frac):
    """GEM_FUSE_PASSA=fact (round-4 factored one-hot: cell = r*128 + q,
    (C,128) column one-hot + group masks + constant-EXP MXU expansion,
    (16R, 128) stats layout) — exact parity with the segment backend."""
    import gem_tpu.kernels.fuse_stream as fs

    monkeypatch.setattr(fs, "_PASSA", "fact")
    rng = np.random.default_rng(seed)
    L = 40
    cfg = benchmark_config(length=L, max_points=2048)
    st = _random_state(rng, cfg.map, occ)
    batch = _random_batch(rng, L, 2048, valid_frac)
    a = jax.jit(lambda s, b: fuse(s, cfg, b, backend="segment"))(st, batch)
    b = jax.jit(lambda s, b: fs.fuse_stream(s, cfg, b, with_lowest=False,
                                            interpret=True))(st, batch)
    _compare(a, b)


def test_stream_passa_fact_one_cell_and_lowest(monkeypatch):
    """fact under the one-cell many-chunk skew (aligned-prefix lanes with
    negative r, out-of-tile lanes with r >= R must stay inert) + the
    ride-along lowest must match the dot kernel."""
    import gem_tpu.kernels.fuse_stream as fs

    rng = np.random.default_rng(3)
    L = 32
    cfg = benchmark_config(length=L, max_points=4096)
    st = _random_state(rng, cfg.map, 0.5)
    batch = _random_batch(rng, L, 4096, 0.95, one_cell=L * L // 2)
    a = jax.jit(lambda s, b: fuse(s, cfg, b, backend="segment"))(st, batch)
    monkeypatch.setattr(fs, "_PASSA", "fact")
    b = jax.jit(lambda s, b: fs.fuse_stream(s, cfg, b, with_lowest=True,
                                            interpret=True))(st, batch)
    _compare(a, b, atol=5e-5)
    monkeypatch.setattr(fs, "_PASSA", "dot")
    c = jax.jit(lambda s, b: fs.fuse_stream(s, cfg, b, with_lowest=True,
                                            interpret=True))(st, batch)
    np.testing.assert_allclose(np.asarray(b.lowest), np.asarray(c.lowest),
                               atol=1e-6)


@pytest.mark.parametrize("tile", [128, 256, 2048, 4096])
def test_stream_passa_fact_tile_ladder(monkeypatch, tile):
    """fact across group counts R = 1, 2, 16, 32 (TILE = R*128; 32 = the
    round-5 shipped default): results match the dot kernel to f32
    dot-reassociation tolerance, colors exactly."""
    import gem_tpu.kernels.fuse_stream as fs

    rng = np.random.default_rng(11)
    L = 64
    cfg = benchmark_config(length=L, max_points=4096)
    st = _random_state(rng, cfg.map, 0.5)
    batch = _random_batch(rng, L, 4096, 0.9)
    monkeypatch.setattr(fs, "_PASSA", "dot")
    a = jax.jit(lambda s, b: fs.fuse_stream(s, cfg, b, with_lowest=True,
                                            interpret=True))(st, batch)
    monkeypatch.setattr(fs, "_PASSA", "fact")
    monkeypatch.setattr(fs, "_TILE_ENV", tile)
    b = jax.jit(lambda s, b: fs.fuse_stream(s, cfg, b, with_lowest=True,
                                            interpret=True))(st, batch)
    _compare(a, b)
    np.testing.assert_allclose(np.asarray(a.lowest), np.asarray(b.lowest),
                               atol=1e-6)


def test_stream_passa_fact_colorless(monkeypatch):
    """fact with with_color=False (the 8-column B2 layout's color columns
    zeroed statically) matches the dot kernel."""
    import gem_tpu.kernels.fuse_stream as fs

    rng = np.random.default_rng(9)
    L = 40
    cfg = benchmark_config(length=L, max_points=2048)
    st = _random_state(rng, cfg.map, 0.4)
    batch = _random_batch(rng, L, 2048, 0.9)
    monkeypatch.setattr(fs, "_PASSA", "dot")
    a = jax.jit(lambda s, b: fs.fuse_stream(s, cfg, b, with_lowest=True,
                                            with_color=False,
                                            interpret=True))(st, batch)
    monkeypatch.setattr(fs, "_PASSA", "fact")
    b = jax.jit(lambda s, b: fs.fuse_stream(s, cfg, b, with_lowest=True,
                                            with_color=False,
                                            interpret=True))(st, batch)
    for k in ("elevation", "variance", "lowest"):
        np.testing.assert_allclose(np.asarray(getattr(a, k)),
                                   np.asarray(getattr(b, k)), atol=5e-6)


def test_stream_passa_scan_lowest_and_colorless(monkeypatch):
    """scan variant with the lowest bound riding along and with_color=False
    (the 7-row colorless layout shares code with the 15-row one)."""
    import gem_tpu.kernels.fuse_stream as fs

    monkeypatch.setattr(fs, "_PASSA", "scan")
    rng = np.random.default_rng(7)
    L = 40
    cfg = benchmark_config(length=L, max_points=2048)
    st = _random_state(rng, cfg.map, 0.4, start=(11, 3))
    batch = _random_batch(rng, L, 2048)
    a = jax.jit(lambda s, b: fuse_stream(s, cfg, b, with_lowest=True,
                                         interpret=True))(st, batch)
    monkeypatch.setattr(fs, "_PASSA", "dot")
    c = jax.jit(lambda s, b: fuse_stream(s, cfg, b, with_lowest=True,
                                         interpret=True))(st, batch)
    _compare(a, c)
    np.testing.assert_allclose(np.asarray(a.lowest), np.asarray(c.lowest),
                               atol=1e-6)
    monkeypatch.setattr(fs, "_PASSA", "scan")
    colorless = dataclasses.replace(
        batch, color=jnp.zeros_like(batch.color),
        intensity=jnp.zeros_like(batch.intensity))
    d = jax.jit(lambda s, b: fuse_stream(s, cfg, b, with_lowest=True,
                                         with_color=False,
                                         interpret=True))(st, colorless)
    e = jax.jit(lambda s, b: fuse_stream(s, cfg, b, with_lowest=True,
                                         with_color=True,
                                         interpret=True))(st, colorless)
    for k in ("elevation", "variance", "lowest"):
        np.testing.assert_allclose(np.asarray(getattr(d, k)),
                                   np.asarray(getattr(e, k)), atol=1e-6)


@pytest.mark.parametrize("passa", ["dot", "scan", "scanp", "fact"])
def test_stream_nan_invalid_points_stay_inert(monkeypatch, passa):
    """A NaN-coordinate point (marked invalid by pointproc's band filter,
    payload left raw) must not poison the map: the one-hot contraction
    multiplies EVERY lane, and IEEE NaN*0=NaN would smear NaN across all
    cell columns of the chunk without pre-sort payload sanitization."""
    import gem_tpu.kernels.fuse_stream as fs

    monkeypatch.setattr(fs, "_PASSA", passa)
    rng = np.random.default_rng(11)
    L = 40
    cfg = benchmark_config(length=L, max_points=512)
    st = _random_state(rng, cfg.map, 0.5)
    batch = _random_batch(rng, L, 512, 0.9)
    h = np.asarray(batch.height).copy()
    v = np.asarray(batch.variance).copy()
    it = np.asarray(batch.intensity).copy()
    valid = np.asarray(batch.valid).copy()
    cell = np.asarray(batch.cell).copy()
    h[7] = np.nan
    v[9] = np.nan
    it[11] = np.nan
    valid[[7, 9, 11]] = False
    cell[[7, 9, 11]] = L * L
    bad = dataclasses.replace(
        batch, height=jnp.asarray(h), variance=jnp.asarray(v),
        intensity=jnp.asarray(it), valid=jnp.asarray(valid),
        cell=jnp.asarray(cell))
    ref = dataclasses.replace(
        batch, valid=jnp.asarray(valid), cell=jnp.asarray(cell))
    a = jax.jit(lambda s, b: fuse_stream(s, cfg, b, with_lowest=True,
                                         interpret=True))(st, bad)
    b = jax.jit(lambda s, b: fuse_stream(s, cfg, b, with_lowest=True,
                                         interpret=True))(st, ref)
    for k in ("elevation", "variance", "lowest", "intensity"):
        x = np.asarray(getattr(a, k))
        assert not np.isnan(x).any(), (passa, k)
        np.testing.assert_array_equal(x, np.asarray(getattr(b, k)),
                                      err_msg=(passa, k))


@pytest.mark.parametrize("passa", ["dot", "scanp", "fact"])
def test_stream_sortk2_matches_on_tie_free_data(monkeypatch, passa):
    """GEM_FUSE_SORTK=2 (comparator drops the v key): identical results to
    the segment backend whenever no exact f32 height tie exists."""
    import gem_tpu.kernels.fuse_stream as fs

    monkeypatch.setattr(fs, "_SORTK", 2)
    monkeypatch.setattr(fs, "_PASSA", passa)
    rng = np.random.default_rng(0)
    L = 40
    cfg = benchmark_config(length=L, max_points=2048)
    st = _random_state(rng, cfg.map, 0.5)
    batch = _random_batch(rng, L, 2048, 0.9)
    a = jax.jit(lambda s, b: fuse(s, cfg, b, backend="segment"))(st, batch)
    b = jax.jit(lambda s, b: fuse_stream(s, cfg, b, with_lowest=False,
                                         interpret=True))(st, batch)
    _compare(a, b)


def test_stream_sortk2_tie_rule_is_batch_order(monkeypatch):
    """At an EXACT f32 height tie among overwrite candidates the 2-key
    stream keeps the FIRST point in batch order — the reference G_fuse's
    own strictly-greater rule (gpu_process.cu:500-507: `elev < h` never
    replaces on equality, so the first-seen tie member wins) — while the
    3-key comparator implements the segment backend's min-variance rule.
    Observable on height-quantized streams (KITTI cm grid); PARITY.md
    "G_fuse ties"."""
    import gem_tpu.kernels.fuse_stream as fs

    L = 16
    cfg = benchmark_config(length=L, max_points=8)
    st = init_map_state(cfg.map)
    cell = 5 * L + 3
    elev = np.full((L, L), cfg.map.invalid_elevation, np.float32)
    var = np.full((L, L), cfg.map.invalid_variance, np.float32)
    elev[5, 3] = 0.0
    var[5, 3] = 1e-4          # tight prior: points at h=2.0 are outliers
    st = st.replace(elevation=jnp.asarray(elev), variance=jnp.asarray(var))
    P = 8
    h = np.zeros(P, np.float32)
    v = np.full(P, 0.5, np.float32)
    c = np.full(P, cell, np.int32)
    valid = np.zeros(P, bool)
    h[0], v[0] = 2.0, 0.3     # first in batch order
    h[1], v[1] = 2.0, 0.1     # same quantized height, smaller variance
    valid[:2] = True
    batch = PointBatch(
        xy=jnp.zeros((P, 2)), height=jnp.asarray(h), variance=jnp.asarray(v),
        cell=jnp.where(jnp.asarray(valid), jnp.asarray(c), L * L),
        color=jnp.zeros(P, jnp.int32), intensity=jnp.zeros(P),
        valid=jnp.asarray(valid))

    monkeypatch.setattr(fs, "_SORTK", 2)
    out2 = jax.jit(lambda s, b: fuse_stream(s, cfg, b, with_lowest=False,
                                            interpret=True))(st, batch)
    monkeypatch.setattr(fs, "_SORTK", 3)
    out3 = jax.jit(lambda s, b: fuse_stream(s, cfg, b, with_lowest=False,
                                            interpret=True))(st, batch)
    assert np.asarray(out2.elevation)[5, 3] == 2.0
    assert np.asarray(out3.elevation)[5, 3] == 2.0
    assert np.asarray(out2.variance)[5, 3] == np.float32(0.3)   # batch order
    assert np.asarray(out3.variance)[5, 3] == np.float32(0.1)   # min-v rule


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_stream_tie_fuzz_divergence_is_bounded(monkeypatch, seed):
    """Fuzz EXACT f32 height ties (coarsely quantized heights/variances so
    duplicate keys are common) and pin PARITY.md's claim that under the
    3-KEY comparator (the backend-consistent mode; the round-4 default is
    the reference-faithful 2-key batch-order rule, pinned separately by
    test_stream_sortk2_tie_rule_is_batch_order) the documented
    overwrite-color corner is the ONLY stream/segment divergence:
    numeric planes agree even under heavy tying; color/intensity may
    differ ONLY at cells where an exact height tie among points with
    mixed color presence exists (PARITY.md 'G_fuse color')."""
    import gem_tpu.kernels.fuse_stream as fs

    monkeypatch.setattr(fs, "_SORTK", 3)
    rng = np.random.default_rng(100 + seed)
    L = 24
    P = 4096
    cfg = benchmark_config(length=L, max_points=P)
    st = _random_state(rng, cfg.map, 0.5)
    # quantized heights (step 0.25) over few cells => many exact ties,
    # quantized variances => exact v ties too
    cell = rng.integers(0, L * L // 8, P).astype(np.int32)
    h = (rng.integers(-8, 9, P) * 0.25).astype(np.float32)
    v = (rng.integers(1, 5, P) * 0.05).astype(np.float32)
    col = np.where(rng.random(P) < 0.5,
                   rng.integers(1, 1 << 24, P), 0).astype(np.int32)
    inten = np.where(col != 0, rng.uniform(0.1, 1.0, P),
                     0.0).astype(np.float32)
    valid = rng.random(P) < 0.95
    batch = PointBatch(
        xy=jnp.zeros((P, 2)), height=jnp.asarray(h), variance=jnp.asarray(v),
        cell=jnp.where(jnp.asarray(valid), jnp.asarray(cell), L * L),
        color=jnp.asarray(col), intensity=jnp.asarray(inten),
        valid=jnp.asarray(valid))
    a = jax.jit(lambda s, b: fuse(s, cfg, b, backend="segment"))(st, batch)
    b = jax.jit(lambda s, b: fuse_stream(s, cfg, b, with_lowest=True,
                                         interpret=True))(st, batch)
    # numeric planes: equal to f32 summation-reassociation tolerance even
    # under heavy tying (both backends pick the (max-h, min-v) winner; a
    # genuinely different pick would differ by the 0.05 variance quantum,
    # four orders above this tolerance)
    for k in ("elevation", "variance"):
        np.testing.assert_allclose(np.asarray(getattr(a, k)),
                                   np.asarray(getattr(b, k)), atol=1e-5,
                                   err_msg=k)

    # color/intensity: divergence allowed only at mixed-color-tie cells
    diff = (np.asarray(a.color) != np.asarray(b.color)).reshape(-1) | \
        (np.asarray(a.intensity) != np.asarray(b.intensity)).reshape(-1)
    allowed = np.zeros(L * L, bool)
    for c in np.unique(cell[valid]):
        hs = h[valid & (cell == c)]
        cols = col[valid & (cell == c)]
        for hv in np.unique(hs):
            tie = hs == hv
            if tie.sum() >= 2 and len(set(cols[tie] != 0)) > 1:
                allowed[c] = True
    bad = np.nonzero(diff & ~allowed)[0]
    assert bad.size == 0, f"unexpected divergence at cells {bad[:10]}"


def test_stream_colorless_mode():
    """with_color=False: elevation/variance identical to the full path on a
    colorless batch; color/intensity planes pass through untouched."""
    rng = np.random.default_rng(6)
    L = 32
    cfg = benchmark_config(length=L, max_points=1024)
    st = _random_state(rng, cfg.map, 0.5)
    batch = _random_batch(rng, L, 1024)
    batch = dataclasses.replace(batch,
                                color=jnp.zeros_like(batch.color),
                                intensity=jnp.zeros_like(batch.intensity))
    a = jax.jit(lambda s, b: fuse_stream(s, cfg, b, with_lowest=True,
                                         with_color=True,
                                         interpret=True))(st, batch)
    b = jax.jit(lambda s, b: fuse_stream(s, cfg, b, with_lowest=True,
                                         with_color=False,
                                         interpret=True))(st, batch)
    for k in ("elevation", "variance", "lowest"):
        np.testing.assert_allclose(np.asarray(getattr(a, k)),
                                   np.asarray(getattr(b, k)), atol=1e-6)
    assert np.array_equal(np.asarray(b.color), np.asarray(st.color))
    assert np.array_equal(np.asarray(b.intensity), np.asarray(st.intensity))

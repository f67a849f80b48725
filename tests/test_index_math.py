"""Unit tests: wrap-around index math vs the C-semantics oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from gem_tpu.core import index_math as im
import reference_semantics as ref


@pytest.mark.parametrize("resolution", [0.1, 0.2, 0.25])
def test_index_shift_matches_c(resolution):
    shifts = np.linspace(-3.7, 3.7, 113).astype(np.float32)
    got = np.asarray(im.index_shift_from_position_shift(jnp.asarray(shifts),
                                                        resolution))
    want = np.array(ref.index_shift_from_position_shift(shifts, resolution))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("length", [74, 75, 120, 128])
@pytest.mark.parametrize("resolution", [0.1, 0.2])
def test_position_to_geo_index_matches_c(length, resolution):
    rng = np.random.default_rng(0)
    center = np.array([1.3, -2.7], np.float32)
    span = length * resolution
    pts = rng.uniform(-0.7 * span, 0.7 * span, size=(512, 2)).astype(np.float32)
    pts += center
    gx, gy, valid = im.position_to_geo_index(
        jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
        jnp.asarray(center), length, resolution)
    gx, gy, valid = map(np.asarray, (gx, gy, valid))
    for i, (px, py) in enumerate(pts):
        want = ref.points_to_index(float(px), float(py), center, length,
                                   resolution)
        if want is None:
            assert not valid[i]
        else:
            assert valid[i]
            assert (gx[i], gy[i]) == want


def test_storage_round_trip():
    length = 75
    start = jnp.asarray([13, 61])
    g = jnp.arange(length)
    sx, sy = im.geo_to_storage(g, g[::-1], start, length)
    gx, gy = im.storage_to_geo(sx, sy, start, length)
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(g))
    np.testing.assert_array_equal(np.asarray(gy), np.asarray(g)[::-1])


@pytest.mark.parametrize("length", [74, 75])
def test_geo_index_position_round_trip(length):
    """Cell-center positions must map back onto the same cell index."""
    resolution = 0.2
    center = jnp.asarray([0.4, -0.6])
    g = jnp.arange(length)
    gx = jnp.repeat(g, length)
    gy = jnp.tile(g, length)
    px, py = im.geo_index_to_position(gx, gy, center, length, resolution)
    gx2, gy2, valid = im.position_to_geo_index(px, py, center, length,
                                               resolution)
    assert bool(jnp.all(valid))
    np.testing.assert_array_equal(np.asarray(gx2), np.asarray(gx))
    np.testing.assert_array_equal(np.asarray(gy2), np.asarray(gy))


def test_band_mask_wrap():
    length = 10
    idx = jnp.arange(length)
    m = np.asarray(im.band_mask(idx, jnp.int32(7), jnp.int32(5), length))
    np.testing.assert_array_equal(np.nonzero(m)[0], [0, 1, 7, 8, 9])
    m0 = np.asarray(im.band_mask(idx, jnp.int32(3), jnp.int32(0), length))
    assert not m0.any()
    mfull = np.asarray(im.band_mask(idx, jnp.int32(4), jnp.int32(10), length))
    assert mfull.all()


@pytest.mark.parametrize("length", [74, 75])
def test_shift_clear_band_matches_c(length):
    for start in [0, 1, 5, length - 1]:
        for shift in [-length + 1, -7, -1, 1, 3, length - 1]:
            first, count = im.shift_clear_band(
                jnp.int32(start), jnp.int32(shift), length)
            first, count = int(first), int(count)
            got = set()
            for k in range(count):
                got.add((first + k) % length)
            want = set()
            for _, f, n in ref.move_bands([start, 0], [shift, 0], length):
                for k in range(n):
                    want.add((f + k) % length)
            assert got == want, (start, shift)


def test_align_position_matches_c():
    res = 0.2
    for c in [-1.33, 0.0, 0.47, 5.001]:
        for s in [-0.61, 0.0, 0.2, 1.07]:
            got = float(im.align_position(jnp.float32(c), jnp.float32(s), res))
            want = ref.position_to_range(c, s, res)
            assert abs(got - want) < 1e-5, (c, s)

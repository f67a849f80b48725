"""Native C++ runtime components vs their NumPy fallbacks."""

import os

import numpy as np
import pytest

from gem_tpu import native


@pytest.fixture(scope="module")
def built():
    return native.available()


def test_native_builds(built):
    # the image ships g++; the library must build
    assert built, "libgem_native.so failed to build"


def test_voxel_filter_centroids(built):
    pts = np.asarray([[0.05, 0.05, 0.0], [0.15, 0.15, 0.0],   # same leaf
                      [1.05, 0.0, 0.0],                        # own leaf
                      [50.0, 0.0, 0.0]], np.float32)           # cropped
    inten = np.asarray([1.0, 3.0, 5.0, 7.0], np.float32)
    out, oi = native.voxel_filter(pts, inten, leaf=0.2,
                                  crop=((-10, 10), (-10, 10), (-10, 10)))
    assert len(out) == 2
    order = np.argsort(out[:, 0])
    np.testing.assert_allclose(out[order][0], [0.1, 0.1, 0.0], atol=1e-6)
    np.testing.assert_allclose(oi[order][0], 2.0)
    np.testing.assert_allclose(out[order][1], [1.05, 0.0, 0.0], atol=1e-6)


def test_voxel_filter_matches_fallback(built):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
    a, _ = native.voxel_filter(pts, leaf=0.5)
    native._lib_backup = native._lib
    native._lib = None
    try:
        b, _ = native.voxel_filter(pts, leaf=0.5)
    finally:
        native._lib = native._lib_backup
    # same cells, same centroids (order-insensitive)
    a_sorted = a[np.lexsort(a.T)]
    b_sorted = b[np.lexsort(b.T)]
    assert len(a) == len(b)
    np.testing.assert_allclose(a_sorted, b_sorted, atol=1e-5)


def test_dedup_cells_min_variance(built):
    x = np.asarray([0.05, 0.06, 1.0], np.float32)
    y = np.asarray([0.05, 0.06, 1.0], np.float32)
    var = np.asarray([0.5, 0.1, 0.2], np.float32)
    kept = native.dedup_cells(x, y, var, resolution=0.2)
    assert set(kept.tolist()) == {1, 2}


def test_dedup_matches_fallback(built):
    rng = np.random.default_rng(1)
    x = rng.uniform(-3, 3, 500).astype(np.float32)
    y = rng.uniform(-3, 3, 500).astype(np.float32)
    var = rng.uniform(0, 1, 500).astype(np.float32)
    a = native.dedup_cells(x, y, var, resolution=0.5)
    native._lib_backup = native._lib
    native._lib = None
    try:
        b = native.dedup_cells(x, y, var, resolution=0.5)
    finally:
        native._lib = native._lib_backup
    np.testing.assert_array_equal(a, b)


def test_prefetcher_sequential(built, tmp_path):
    paths = []
    for i in range(6):
        p = os.path.join(tmp_path, f"f{i}.bin")
        with open(p, "wb") as f:
            f.write(bytes([i]) * (100 + i))
        paths.append(p)
    pf = native.FramePrefetcher(paths, ring=3)
    try:
        for i in range(6):
            data = pf[i]
            assert len(data) == 100 + i
            assert data[0] == i
    finally:
        pf.close()


def test_native_pcd_round_trip(built, tmp_path):
    if not built:
        pytest.skip("no native lib")
    import ctypes
    lib = native._load()
    data = np.arange(14, dtype=np.float32).reshape(2, 7)
    path = os.path.join(tmp_path, "n.pcd").encode()
    assert lib.gem_write_pcd(path, np.ascontiguousarray(data), 2, 7) == 2
    n = ctypes.c_int()
    fields = ctypes.c_int()
    assert lib.gem_read_pcd_info(path, ctypes.byref(n),
                                 ctypes.byref(fields)) == 0
    assert (n.value, fields.value) == (2, 7)
    out = np.empty((2, 7), np.float32)
    assert lib.gem_read_pcd_data(path, out, 2, 7) == 2
    np.testing.assert_array_equal(out, data)
    # and the Python reader parses the native writer's file
    from gem_tpu.io.pcd import load_pcd
    d = load_pcd(path.decode())
    np.testing.assert_allclose(d["x"], [0, 7])

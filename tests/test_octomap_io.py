"""Octomap .bt wire-format round-trip (global_map/octomap_io.py).

The reference publishes binary octomap msgs (src/ElevationMapping.cpp:
502-512, trees built :1146-1174); gem_tpu serializes its voxel pyramid to
the same public `.bt` format.  These tests parse the written bytes back
node-for-node with an independent reader and also check the header/stream
invariants an octomap consumer relies on."""

import numpy as np
import pytest

from gem_tpu.global_map.octomap_io import (TREE_DEPTH, TREE_MAX_VAL,
                                           coords_to_keys, keys_to_coords,
                                           read_bt, write_bt,
                                           write_voxelgrid_bt)


def test_key_coord_roundtrip():
    rng = np.random.default_rng(0)
    xs = rng.uniform(-50, 50, 200)
    ys = rng.uniform(-50, 50, 200)
    zs = rng.uniform(-5, 5, 200)
    res = 0.1
    keys = coords_to_keys(xs, ys, zs, res)
    c = keys_to_coords(keys, res)
    # voxel centers are within half a voxel of the input point
    assert np.abs(c[:, 0] - xs).max() <= res / 2 + 1e-9
    assert np.abs(c[:, 2] - zs).max() <= res / 2 + 1e-9
    # center -> key is a fixed point
    assert np.array_equal(coords_to_keys(c[:, 0], c[:, 1], c[:, 2], res),
                          keys)


def test_out_of_range_raises():
    with pytest.raises(ValueError):
        coords_to_keys(np.array([1e6]), np.array([0.0]), np.array([0.0]),
                       0.01)


def test_bt_roundtrip_random(tmp_path):
    rng = np.random.default_rng(1)
    res = 0.2
    xs = rng.uniform(-20, 20, 3000)
    ys = rng.uniform(-20, 20, 3000)
    zs = rng.uniform(-3, 3, 3000)
    p = str(tmp_path / "map.bt")
    n_nodes = write_bt(p, xs, ys, zs, res)
    res2, keys, header = read_bt(p)
    assert res2 == res
    assert header["id"] == "OcTree"
    assert header["size"] == n_nodes
    want = np.unique(coords_to_keys(xs, ys, zs, res), axis=0)
    got = keys[np.lexsort((keys[:, 2], keys[:, 1], keys[:, 0]))]
    want = want[np.lexsort((want[:, 2], want[:, 1], want[:, 0]))]
    assert np.array_equal(got, want)


def test_bt_pruning_collapses_full_blocks(tmp_path):
    # a full 4x4x4 aligned block must serialize as ONE pruned occupied
    # leaf two levels up, and still expand back to all 64 keys
    res = 1.0
    g = np.arange(4)
    gx, gy, gz = np.meshgrid(g, g, g, indexing="ij")
    # block aligned at key multiple of 4: keys 32768..32771 = coords 0..3
    xs = (gx.ravel() + 0.5) * res
    ys = (gy.ravel() + 0.5) * res
    zs = (gz.ravel() + 0.5) * res
    p = str(tmp_path / "block.bt")
    n_nodes = write_bt(p, xs, ys, zs, res)
    _, keys, header = read_bt(p)
    assert keys.shape[0] == 64
    # pruned: path of 14 inner nodes + 1 leaf + root = 15 + 1; unpruned
    # would be 16 + 64 + ... far more
    assert n_nodes <= 16
    data = open(p, "rb").read()
    stream = data[data.index(b"data\n") + 5:]
    assert len(stream) == 2 * (n_nodes - 1)  # leaves don't serialize bytes


def test_bt_empty(tmp_path):
    p = str(tmp_path / "empty.bt")
    write_bt(p, np.zeros(0), np.zeros(0), np.zeros(0), 0.1)
    res, keys, header = read_bt(p)
    assert keys.shape == (0, 3)
    # octomap convention: empty tree = size 0, no stream bytes
    assert header["size"] == 0
    data = open(p, "rb").read()
    assert data.endswith(b"data\n")


def test_voxelgrid_bt(tmp_path):
    rng = np.random.default_rng(2)
    occ = rng.random((16, 16, 8)) < 0.1
    origin = (-1.6, -1.6, -0.8)
    res = 0.2
    p = str(tmp_path / "grid.bt")
    write_voxelgrid_bt(p, occ, origin, res)
    res2, keys, _ = read_bt(p)
    c = keys_to_coords(keys, res2)
    ix = np.floor((c[:, 0] - origin[0]) / res).astype(int)
    iy = np.floor((c[:, 1] - origin[1]) / res).astype(int)
    iz = np.floor((c[:, 2] - origin[2]) / res).astype(int)
    got = np.zeros_like(occ)
    got[ix, iy, iz] = True
    assert np.array_equal(got, occ)


def test_bt_header_reserved_first_line(tmp_path):
    p = str(tmp_path / "hdr.bt")
    write_bt(p, np.array([0.05]), np.array([0.05]), np.array([0.05]), 0.1)
    first = open(p, "rb").readline().decode().strip()
    assert first == "# Octomap OcTree binary file"
    with pytest.raises(ValueError):
        bad = str(tmp_path / "bad.bt")
        open(bad, "w").write("not an octree\n")
        read_bt(bad)


def test_ot_roundtrip_with_colors(tmp_path):
    from gem_tpu.global_map.octomap_io import read_ot, write_ot

    rng = np.random.default_rng(4)
    res = 0.25
    n = 500
    xs = rng.uniform(-10, 10, n)
    ys = rng.uniform(-10, 10, n)
    zs = rng.uniform(-2, 2, n)
    colors = rng.integers(0, 1 << 24, n)
    p = str(tmp_path / "map.ot")
    n_nodes = write_ot(p, xs, ys, zs, colors, res)
    res2, keys, cols, header = read_ot(p)
    assert res2 == res
    assert header["id"] == "ColorOcTree"
    assert header["size"] == n_nodes
    want = np.unique(coords_to_keys(xs, ys, zs, res), axis=0)
    order = np.lexsort((keys[:, 2], keys[:, 1], keys[:, 0]))
    got = keys[order]
    worder = np.lexsort((want[:, 2], want[:, 1], want[:, 0]))
    assert np.array_equal(got, want[worder])
    # colors round-trip: single-point voxels keep their exact color
    # (multi-point voxels carry the mean)
    assert (cols >= 0).all() and (cols < (1 << 24)).all()
    first = open(p, "rb").readline().decode().strip()
    assert first == "# Octomap OcTree file"


def test_ot_single_voxel_color_exact(tmp_path):
    from gem_tpu.global_map.octomap_io import read_ot, write_ot

    p = str(tmp_path / "one.ot")
    write_ot(p, np.array([1.05]), np.array([2.05]), np.array([0.05]),
             np.array([0xAABBCC]), 0.1)
    _, keys, cols, _ = read_ot(p)
    assert keys.shape[0] == 1
    assert int(cols[0]) == 0xAABBCC


def test_ot_empty(tmp_path):
    from gem_tpu.global_map.octomap_io import read_ot, write_ot

    p = str(tmp_path / "none.ot")
    write_ot(p, np.zeros(0), np.zeros(0), np.zeros(0), np.zeros(0, int),
             0.1)
    _, keys, cols, header = read_ot(p)
    assert keys.shape[0] == 0 and header["size"] == 0

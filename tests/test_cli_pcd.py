"""CLI replay + PCD writer round trip."""

import os

import numpy as np
import pytest

from gem_tpu.io.cli import main
from gem_tpu.io.pcd import load_pcd, save_pcd


def test_pcd_round_trip(tmp_path):
    path = os.path.join(tmp_path, "t.pcd")
    n = save_pcd(path, [1.0, 2.0], [3.0, 4.0], [5.0, 6.0],
                 [0xFF8040, 0x102030], [7.0, 8.0], [0.1, 0.2], [0.5, 0.6])
    assert n == 2
    d = load_pcd(path)
    np.testing.assert_allclose(d["x"], [1, 2])
    np.testing.assert_allclose(d["travers"], [0.5, 0.6])
    np.testing.assert_array_equal(d["rgb"], [0xFF8040, 0x102030])


def test_pcd_valid_mask(tmp_path):
    path = os.path.join(tmp_path, "m.pcd")
    n = save_pcd(path, [1.0, 2.0, 3.0], [0, 0, 0], [0, 0, 0],
                 [0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0],
                 valid=[True, False, True])
    assert n == 2
    d = load_pcd(path)
    np.testing.assert_allclose(d["x"], [1, 3])


def test_cli_run_save_resume(tmp_path):
    ck = os.path.join(tmp_path, "ck.npz")
    pcd = os.path.join(tmp_path, "map.pcd")
    rc = main(["run", "--frames", "8", "--max-points", "512",
               "--checkpoint", ck, "--save-map", pcd])
    assert rc == 0
    assert os.path.exists(ck)
    d = load_pcd(pcd)
    assert len(d["x"]) > 50
    rc = main(["run", "--frames", "4", "--max-points", "512",
               "--resume", ck])
    assert rc == 0


def test_cli_info():
    assert main(["info", "--preset", "yq"]) == 0


def test_cli_yaml_config(tmp_path):
    cfg_path = os.path.join(tmp_path, "c.yaml")
    with open(cfg_path, "w") as f:
        f.write("map:\n  length: 24\n  resolution: 0.5\nmax_points: 256\n")
    rc = main(["run", "--frames", "4", "--config", cfg_path])
    assert rc == 0


def test_cli_unknown_yaml_key_rejected(tmp_path):
    cfg_path = os.path.join(tmp_path, "bad.yaml")
    with open(cfg_path, "w") as f:
        f.write("map:\n  lenght: 24\n")
    with pytest.raises(KeyError):
        main(["run", "--frames", "1", "--config", cfg_path])


def test_cli_scan_mode_matches_stepwise(tmp_path):
    a = os.path.join(tmp_path, "a.npz")
    b = os.path.join(tmp_path, "b.npz")
    rc = main(["run", "--frames", "12", "--max-points", "512",
               "--checkpoint", a])
    assert rc == 0
    rc = main(["run", "--frames", "12", "--max-points", "512",
               "--scan", "4", "--checkpoint", b])
    assert rc == 0
    da, db = np.load(a), np.load(b)
    np.testing.assert_array_equal(da["map/elevation"], db["map/elevation"])


def test_cli_scan_with_tail(tmp_path):
    # 10 frames, scan 4 -> 2 scans + 2 stepwise tail frames
    rc = main(["run", "--frames", "10", "--max-points", "256",
               "--scan", "4"])
    assert rc == 0

"""KITTI converter on a synthesized mini-drive + camera colorization path."""

import math
import os

import numpy as np
import jax.numpy as jnp
import pytest

from gem_tpu.config import (BodyFilterConfig, CameraConfig, MapConfig,
                            PipelineConfig, SensorConfig, SubmapConfig)
from gem_tpu.io import kitti
from gem_tpu.io.replay import load_npz_frame
from gem_tpu.kernels.pointproc import colorize
from gem_tpu.core.state import unpack_rgb
from gem_tpu.mapping.pipeline import ElevationPipeline, Frame


def _write_mini_drive(root, n=3):
    os.makedirs(os.path.join(root, "velodyne_points", "data"))
    os.makedirs(os.path.join(root, "oxts", "data"))
    rng = np.random.default_rng(0)
    for i in range(n):
        pts = rng.uniform(-20, 20, (500, 3))
        pts[:, 2] = -1.7
        raw = np.concatenate([pts, rng.random((500, 1))],
                             axis=1).astype(np.float32)
        raw.tofile(os.path.join(root, "velodyne_points", "data",
                                f"{i:010d}.bin"))
        lat = 49.0 + i * 1e-6      # ~0.1 m northward per frame
        row = np.zeros(30)
        row[:6] = [lat, 8.43, 110.0, 0.0, 0.0, math.pi / 2]
        np.savetxt(os.path.join(root, "oxts", "data", f"{i:010d}.txt"),
                   row[None])


def test_convert_drive_and_replay(tmp_path):
    drive = os.path.join(tmp_path, "drive")
    outd = os.path.join(tmp_path, "npz")
    _write_mini_drive(drive)
    n = kitti.convert_drive(drive, outd)
    assert n == 3
    files = sorted(os.listdir(outd))
    assert files == ["000000.npz", "000001.npz", "000002.npz"]

    cfg = PipelineConfig(map=MapConfig(length=32, resolution=0.5),
                         body_filter=BodyFilterConfig(mode="none"),
                         max_points=1024)
    f0 = load_npz_frame(cfg, os.path.join(outd, files[0]))
    f2 = load_npz_frame(cfg, os.path.join(outd, files[2]))
    # poses start at origin and drift north ~0.22 m over 2 frames
    np.testing.assert_allclose(np.asarray(f0.track_position), 0, atol=1e-5)
    d = np.asarray(f2.track_position) - np.asarray(f0.track_position)
    assert 0.05 < np.linalg.norm(d) < 1.0

    pipe = ElevationPipeline(cfg)
    for f in (f0, f2):
        out = pipe.process(f)
    assert int(out.metrics["points_valid"]) > 50


def test_kitti_calib_projection(tmp_path):
    calib = os.path.join(tmp_path, "calib.txt")
    with open(calib, "w") as f:
        f.write("P_rect_02: 700 0 600 0 0 700 180 0 0 0 1 0\n")
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        # velodyne x-forward -> camera z-forward
        f.write("Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0\n")
    P = kitti.projection_matrix(kitti.read_calib(calib))
    assert P.shape == (3, 4)
    # a point 10 m ahead on the optical axis projects at the center
    uvw = P @ np.asarray([10.0, 0.0, 0.0, 1.0])
    u, v = uvw[0] / uvw[2], uvw[1] / uvw[2]
    assert abs(u - 600) < 1 and abs(v - 180) < 1


def test_rotmat_quat_round_trip():
    from gem_tpu.motion.updater import quat_to_rotmat

    rng = np.random.default_rng(3)
    for _ in range(10):
        a = rng.normal(size=(3, 3))
        q_, _r = np.linalg.qr(a)
        if np.linalg.det(q_) < 0:
            q_[:, 0] *= -1
        quat = kitti.rotmat_to_quat(q_)
        R2 = np.asarray(quat_to_rotmat(jnp.asarray(quat)))
        np.testing.assert_allclose(R2, q_, atol=1e-5)


def test_colorize_samples_image():
    # camera looking along +z; projection u = 100*x/z + 32, v = 100*y/z + 32
    P = np.asarray([[100, 0, 32, 0], [0, 100, 32, 0], [0, 0, 1, 0]],
                   np.float32)
    img = np.zeros((64, 64, 3), np.uint8)
    img[32, 52] = [200, 100, 50]     # v=32, u=52  <=  x/z=0.2, y/z=0
    pts = jnp.asarray([[0.2, 0.0, 1.0],     # hits the colored pixel
                       [0.0, 0.0, -1.0],    # behind camera
                       [5.0, 5.0, 1.0]],    # projects out of bounds
                      jnp.float32)
    packed, ok = colorize(pts, jnp.asarray(img), P.reshape(-1))
    r, g, b = unpack_rgb(packed)
    assert np.asarray(ok).tolist() == [True, False, False]
    assert (int(r[0]), int(g[0]), int(b[0])) == (200, 100, 50)
    assert int(packed[1]) == 0 and int(packed[2]) == 0


def test_pipeline_with_camera_colors_map():
    L = 32
    cfg = PipelineConfig(
        map=MapConfig(length=L, resolution=0.5),
        sensor=SensorConfig(model="perfect"),
        body_filter=BodyFilterConfig(mode="none"),
        submap=SubmapConfig(max_submaps=2, capacity=512),
        camera=CameraConfig(image_height=64, image_width=64,
                            projection=tuple(np.asarray(
                                [[100, 0, 32, 0], [0, 100, 32, 0],
                                 [0, 0, 1, 0]], np.float32).reshape(-1))),
        max_points=256,
    )
    # points on the ground ahead of the camera (+z), widely spread
    rng = np.random.default_rng(0)
    n = 200
    pts = np.zeros((256, 3), np.float32)
    pts[:n, 0] = rng.uniform(-1, 1, n)      # x/z in view
    pts[:n, 1] = rng.uniform(-1, 1, n)
    pts[:n, 2] = rng.uniform(2.0, 6.0, n)
    valid = np.zeros(256, bool)
    valid[:n] = True
    img = np.full((64, 64, 3), 77, np.uint8)
    inten = np.ones(256, np.float32)
    frame = Frame(
        points=jnp.asarray(pts), intensity=jnp.asarray(inten),
        valid=jnp.asarray(valid), transform=jnp.eye(4),
        r_base_sensor=jnp.eye(3), t_base_sensor=jnp.zeros(3),
        r_map_base=jnp.eye(3), t_map_base=jnp.zeros(3),
        track_position=jnp.zeros(3),
        pose_quat=jnp.asarray([1.0, 0, 0, 0]), pose_cov=jnp.zeros((6, 6)),
        colors=jnp.zeros(256, jnp.int32), image=jnp.asarray(img),
        loop_closure=jnp.zeros((), bool))
    pipe = ElevationPipeline(cfg)
    pipe.process(frame)
    color = np.asarray(pipe.state.map.color)
    fused = np.asarray(pipe.state.map.elevation) != -10
    assert fused.sum() > 5
    # fused cells carry the sampled image color
    r, g, b = unpack_rgb(jnp.asarray(color[fused]))
    assert (np.asarray(r) == 77).any()


def test_convert_drive_with_images_and_camera(tmp_path):
    from PIL import Image

    drive = os.path.join(tmp_path, "drive")
    outd = os.path.join(tmp_path, "npz")
    _write_mini_drive(drive)
    imgdir = os.path.join(drive, "image_02", "data")
    os.makedirs(imgdir)
    for i in range(3):
        arr = np.full((48, 64, 3), 50 + i, np.uint8)
        Image.fromarray(arr).save(os.path.join(imgdir, f"{i:010d}.png"))
    calib = os.path.join(tmp_path, "calib.txt")
    with open(calib, "w") as f:
        f.write("P_rect_02: 70 0 32 0 0 70 24 0 0 0 1 0\n")
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        f.write("Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0\n")

    n = kitti.convert_drive(drive, outd, calib_path=calib)
    assert n == 3
    cam = np.load(os.path.join(outd, "camera.npz"))
    assert int(cam["image_height"]) == 48

    from gem_tpu.config import CameraConfig
    cfg = PipelineConfig(
        map=MapConfig(length=32, resolution=0.5),
        body_filter=BodyFilterConfig(mode="none"),
        camera=CameraConfig(image_height=48, image_width=64,
                            projection=tuple(float(v)
                                             for v in cam["projection"])),
        max_points=1024)
    f0 = load_npz_frame(cfg, os.path.join(outd, "000000.npz"))
    assert f0.image is not None and f0.image.shape == (48, 64, 3)
    pipe = ElevationPipeline(cfg)
    pipe.process(f0)
    color = np.asarray(pipe.state.map.color)
    fused = np.asarray(pipe.state.map.elevation) != -10
    assert fused.sum() > 5
    # some fused cells in front of the camera picked up the image color
    assert (color[fused] != 0).any()

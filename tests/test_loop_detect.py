"""MR_SLAM-lite end-to-end: DiSCO screening -> SE(2) factors -> pose graph
-> joint re-stitch, with NO externally supplied poses (round-3 verdict
missing #1 / next-round #5).  Reference delegates all of this to the
external MR_SLAM stack over dislam_msgs (README.md:3-4, InterPR.msg)."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from gem_tpu.config import (BodyFilterConfig, MapConfig, PipelineConfig,
                            SensorConfig, SubmapConfig)
from gem_tpu.global_map import submaps as sm
from gem_tpu.multirobot.loop_detect import (InterLoop, _drift_consensus,
                                            fleet_loop_closure,
                                            optimize_pose_graph,
                                            optimize_z_graph,
                                            phase_correlate_2d)


def _cfg(capacity=1024):
    return PipelineConfig(
        map=MapConfig(length=32, resolution=0.25),
        sensor=SensorConfig(model="laser"),
        body_filter=BodyFilterConfig(mode="none"),
        submap=SubmapConfig(max_submaps=4, capacity=capacity,
                            keyframe_distance=1.0, store_ortho=False,
                            keyframe_scan_points=0, overlap_radius=25.0),
        max_points=256,
    )


def _place_scene(seed, n=360):
    """Fixed physical structure around a place: asymmetric clusters (the
    same physical points are observed by every visiting robot)."""
    rng = np.random.default_rng(seed)
    pts = np.concatenate([
        rng.normal([5, 0], 0.5, (n // 2, 2)),
        rng.normal([-3, 6], 1.0, (n // 4, 2)),
        rng.normal([0, -8], 0.8, (n // 4, 2)),
    ]).astype(np.float32)
    return pts


def _apply_se2(pts, theta, t):
    c, s = math.cos(theta), math.sin(theta)
    R = np.asarray([[c, -s], [s, c]], np.float32)
    return pts @ R.T + np.asarray(t, np.float32)


def _buf(xy, z, capacity):
    n = len(xy)
    x = np.zeros(capacity, np.float32)
    y = np.zeros(capacity, np.float32)
    zz = np.zeros(capacity, np.float32)
    x[:n], y[:n], zz[:n] = xy[:, 0], xy[:, 1], z
    return sm.PointBuffer(
        x=jnp.asarray(x), y=jnp.asarray(y), z=jnp.asarray(zz),
        variance=jnp.full((capacity,), 0.1), intensity=jnp.zeros(capacity),
        traver=jnp.full((capacity,), 0.5),
        color=jnp.zeros(capacity, jnp.int32),
        valid=jnp.asarray(np.arange(capacity) < n))


def _robot_store(cfg, places, drift=(0.0, (0.0, 0.0)), drift_z=0.0):
    """Submaps at `places` (true keyframe xy); the robot's ESTIMATED frame
    is the truth transformed by `drift` = (theta, t) plus a vertical
    offset `drift_z`: stored coords p_est = R(theta) @ p_true + t,
    z_est = z_true + drift_z (true terrain z = 1.0, true pose z = 0)."""
    theta, t = drift
    store = sm.init_store(cfg)
    for seed, place in places:
        scene = _place_scene(seed) + np.asarray(place, np.float32)
        est = _apply_se2(scene, theta, t)
        c_est = _apply_se2(np.asarray([place], np.float32), theta, t)[0]
        z = np.full(len(est), 1.0 + drift_z, np.float32)
        pose = np.zeros(7, np.float32)
        pose[:2] = c_est
        pose[2] = drift_z
        pose[3] = math.cos(theta / 2)
        pose[6] = math.sin(theta / 2)
        store = sm.finalize_submap(store, _buf(est, z, cfg.submap.capacity),
                                   pose)
    return store


def test_phase_correlation_convention():
    """img_a(p) = img_b(p - d): the pinned sign convention the factor
    algebra depends on."""
    rng = np.random.default_rng(0)
    G = 64
    img_a = (rng.random((G, G)) < 0.1).astype(np.float32)
    img_b = np.roll(img_a, (5, -3), axis=(0, 1))  # b = a shifted by s
    dx, dy, peak = jax.jit(phase_correlate_2d)(jnp.asarray(img_a),
                                               jnp.asarray(img_b))
    assert (float(dx), float(dy)) == (-5.0, 3.0)
    assert float(peak) > 0.5


def test_pose_graph_closes_simple_loop():
    """Two nodes, one loop edge pulling node 1 to (1, 0, 0): GN converges
    to the constraint with the anchor fixed."""
    nodes = np.asarray([[0, 0, 0], [2.0, 1.0, 0.5]])
    edges = [(0, 1, np.asarray([1.0, 0.0, 0.0]), 10.0)]
    out = optimize_pose_graph(nodes, edges)
    np.testing.assert_allclose(out[0], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [1.0, 0.0, 0.0], atol=1e-4)


def test_fleet_loop_closure_end_to_end():
    """Robot B revisits both of robot A's places with SE(2) odometry drift;
    the framework must detect the loops from signatures alone, recover the
    drift and re-stitch — no externally supplied poses."""
    cfg = _cfg()
    theta = 2 * math.pi * 5 / 64        # exact sector multiple
    t_d = (1.2, -0.8)
    places = [(7, (0.0, 0.0)), (8, (14.0, 3.0))]
    store_a = _robot_store(cfg, places)                  # unbiased
    store_b = _robot_store(cfg, places, drift=(theta, t_d))
    fleet = jax.tree.map(lambda *xs: jnp.stack(xs), store_a, store_b)

    corrected, stats, records = fleet_loop_closure(fleet, cfg)
    assert stats["n_loops"] >= 2, stats
    # every detected pair is cross-robot: merged ids 0-1 are A, 2-3 are B
    for (i, j) in stats["pairs"]:
        assert (i < 2) <= (j >= 2)
    assert stats["n_cells_fused"] > 0, stats
    assert len(records.items) == stats["n_loops"]

    # B's corrected poses returned to the TRUE keyframe positions
    poses = np.asarray(jax.device_get(corrected.poses))
    bev_res = 2 * cfg.submap.overlap_radius / 128
    for idx, (_, place) in enumerate(places):
        est = poses[2 + idx, :2]
        np.testing.assert_allclose(est, place, atol=3 * bev_res)
    # and the drift magnitude was genuinely recovered (not a no-op)
    assert stats["max_pose_correction_m"] > 0.5

    # corrected B submap points align with A's physical structure
    slots = corrected.slots
    xa = np.asarray(slots.x[0]); ya = np.asarray(slots.y[0])
    va = np.asarray(slots.valid[0])
    xb = np.asarray(slots.x[2]); yb = np.asarray(slots.y[2])
    vb = np.asarray(slots.valid[2])
    pa = np.stack([xa[va], ya[va]], axis=1)
    pb = np.stack([xb[vb], yb[vb]], axis=1)
    d = np.linalg.norm(pa[None, :, :] - pb[:, None, :], axis=-1).min(axis=1)
    assert np.median(d) < 3 * bev_res, np.median(d)


def test_z_graph_closes_linear_loop():
    """Two robots (nodes 0-1 = A at z 0, nodes 2-3 = B believing z = 0.7
    from drift); odometry edges keep each robot rigid, the loop edge pins
    B to A's height: B's optimized z returns to 0."""
    e_z = np.asarray([0.0, 0.0, 0.7, 0.7])
    edges = [(0, 1, 0.0, 1.0), (2, 3, 0.0, 1.0),
             # loop i=0, j=2: measured dz = drift_i - drift_j = -0.7
             # -> m = (e_j - e_i) + dz = 0.0
             (0, 2, 0.0, 10.0)]
    out = optimize_z_graph(e_z, edges)
    np.testing.assert_allclose(out, [0.0, 0.0, 0.0, 0.0], atol=1e-6)


def test_drift_consensus_keeps_every_robot_pair():
    """3+ robots: consensus clusters PER robot pair — a verified loop
    between (0, 2) must survive alongside two agreeing (0, 1) loops
    (round-4 advisor: the single-cluster version discarded it, leaving
    robot 2 permanently misaligned)."""
    mk = lambda i, j, t: InterLoop(i=i, j=j, yaw=0.0,
                                   t=np.asarray(t, np.float64),
                                   similarity=0.95, peak=0.5)
    # nodes 0-1 robot 0, node 2 robot 1, node 3 robot 2; all at origin
    xyt = np.zeros((4, 3))
    robot_of = np.asarray([0, 0, 1, 2])
    loops = [mk(0, 2, (1.0, 0.0)), mk(1, 2, (1.0, 0.05)),   # pair (0, 1)
             mk(0, 3, (-2.0, 1.0))]                         # pair (0, 2)
    kept = _drift_consensus(loops, xyt, robot_of)
    pairs = {(robot_of[lp.i], robot_of[lp.j]) for lp in kept}
    assert pairs == {(0, 1), (0, 2)}
    assert len(kept) == 3
    # an outlier within a pair is still rejected by that pair's cluster
    loops.append(mk(0, 2, (40.0, -7.0)))                    # bogus (0, 1)
    kept = _drift_consensus(loops, xyt, robot_of)
    assert len(kept) == 3


def test_fleet_loop_closure_corrects_z_drift():
    """Injected VERTICAL drift on robot B (no external poses anywhere):
    the loop factors carry a dz measured from matched-submap height
    statistics and the z graph returns B's poses and points to true
    height (round-4 verdict missing #1; reference anchor: Map_optmove's
    height update, gpu_process.cu:1195-1254)."""
    cfg = _cfg()
    theta = 2 * math.pi * 5 / 64
    t_d = (1.2, -0.8)
    dz = 0.7
    places = [(7, (0.0, 0.0)), (8, (14.0, 3.0))]
    store_a = _robot_store(cfg, places)
    store_b = _robot_store(cfg, places, drift=(theta, t_d), drift_z=dz)
    fleet = jax.tree.map(lambda *xs: jnp.stack(xs), store_a, store_b)

    corrected, stats, records = fleet_loop_closure(fleet, cfg)
    assert stats["n_loops"] >= 2, stats
    assert stats["n_z_loops"] >= 1, stats
    # the per-loop measured offset is drift_a - drift_b = -0.7
    for v in stats["loop_dz_m"]:
        np.testing.assert_allclose(v, -dz, atol=0.05)
    assert stats["max_z_correction_m"] > 0.5, stats

    poses = np.asarray(jax.device_get(corrected.poses))
    np.testing.assert_allclose(poses[2:4, 2], 0.0, atol=0.05)
    # B's re-stitched points dropped back to the true terrain height
    zb = np.asarray(corrected.slots.z[2])
    vb = np.asarray(corrected.slots.valid[2])
    np.testing.assert_allclose(np.median(zb[vb]), 1.0, atol=0.05)
    # the wire record carries the z factor
    assert abs(records.items[0].factor_pose[2] + dz) < 0.05


def test_center_gate_admits_large_drift():
    """Round-4 advisor: the default colocation gate (0.4 * overlap_radius
    = 10 m here) silently caps recoverable inter-robot drift.  With a
    12 m believed-center drift every true pair is gated out by default
    (geometry: cross distances are 12 / 12 / 25.2 / 14.3 m), but widening
    `center_gate` to 18 m recovers the drift end-to-end — the peak
    verification + per-pair consensus absorb the one mismatched-place
    pair (A2-B1 at 14.3 m) the wider gate admits."""
    cfg = _cfg()
    t_d = (12.0, 0.0)
    places = [(7, (0.0, 0.0)), (8, (9.0, 14.0))]
    store_a = _robot_store(cfg, places)
    store_b = _robot_store(cfg, places, drift=(0.0, t_d))
    fleet = jax.tree.map(lambda *xs: jnp.stack(xs), store_a, store_b)

    _, stats, _ = fleet_loop_closure(fleet, cfg)
    assert stats["n_loops"] == 0, stats

    corrected, stats, _ = fleet_loop_closure(fleet, cfg, center_gate=18.0)
    assert stats["n_loops"] >= 2, stats
    assert stats["max_pose_correction_m"] > 10.0, stats
    poses = np.asarray(jax.device_get(corrected.poses))
    bev_res = 2 * cfg.submap.overlap_radius / 128
    for idx, (_, place) in enumerate(places):
        np.testing.assert_allclose(poses[2 + idx, :2], place,
                                   atol=3 * bev_res)


def test_fleet_loop_closure_distinct_areas_no_loops():
    """Robots in disjoint areas: no candidate clears the similarity bar,
    the merged store passes through untouched."""
    cfg = _cfg()
    store_a = _robot_store(cfg, [(7, (0.0, 0.0))])
    store_b = _robot_store(cfg, [(99, (200.0, 200.0))])
    fleet = jax.tree.map(lambda *xs: jnp.stack(xs), store_a, store_b)
    merged, stats, records = fleet_loop_closure(fleet, cfg)
    assert stats["n_loops"] == 0
    assert records.items == []

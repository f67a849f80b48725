"""Accuracy benchmark: TPU replay vs CPU-reference replay vs ground truth.

The north-star accuracy target (BASELINE.md): elevation RMSE vs the CPU
reference < 5 cm on a replay.  Runs the same frame sequence through the
jitted step on the TPU and on the CPU backend, compares the final elevation
planes on co-fused cells, and also scores both against the synthetic world's
ground truth.  Writes BENCH_ACCURACY.json.

Usage: python bench/accuracy.py [--frames 60] [--length 128]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _final_state(cfg, frames, device, fuse_backend):
    import jax

    from gem_tpu.mapping.pipeline import init_pipeline_state, step

    f = jax.jit(functools.partial(step, cfg=cfg, fuse_backend=fuse_backend),
                )
    state = jax.device_put(init_pipeline_state(cfg), device)
    for fr in frames:
        fr = jax.device_put(fr, device)
        state, _ = f(state, fr)
    jax.block_until_ready(state)
    return state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--length", type=int, default=128)
    ap.add_argument("--points", type=int, default=16384)
    args = ap.parse_args()

    import jax

    from gem_tpu.config import (BodyFilterConfig, MapConfig, PipelineConfig,
                                SensorConfig)
    from gem_tpu.core import index_math as im
    from gem_tpu.io.replay import synthetic_frames

    cfg = PipelineConfig(
        map=MapConfig(length=args.length, resolution=0.1,
                      max_shift_cells=16),
        sensor=SensorConfig(model="laser", min_radius=0.01),
        body_filter=BodyFilterConfig(mode="none"),
        max_points=args.points,
    )
    frames = []
    world = None
    for fr, _, world in synthetic_frames(cfg, args.frames,
                                         n_points=args.points, speed=0.15,
                                         noise=0.005, seed=11):
        frames.append(fr)

    tpu = jax.devices()[0]
    s_tpu = _final_state(cfg, frames, tpu, "pallas")
    e_tpu = np.asarray(s_tpu.map.elevation)

    cpu = jax.devices("cpu")[0]
    s_cpu = _final_state(cfg, frames, cpu, "segment")
    e_cpu = np.asarray(s_cpu.map.elevation)

    both = (e_tpu != -10) & (e_cpu != -10)
    rmse_vs_cpu = float(np.sqrt(np.mean((e_tpu[both] - e_cpu[both]) ** 2)))

    # vs ground truth
    import jax.numpy as jnp

    L = cfg.map.length
    g = jnp.arange(L)
    sx = jnp.repeat(g, L)
    sy = jnp.tile(g, L)
    gx, gy = im.storage_to_geo(sx, sy, s_tpu.map.start, L)
    px, py = im.geo_index_to_position(gx, gy, s_tpu.map.center, L,
                                      cfg.map.resolution)
    gt = world.height(np.asarray(px), np.asarray(py)).reshape(-1)
    fused = (e_tpu.reshape(-1) != -10)
    err = e_tpu.reshape(-1)[fused] - gt[fused]
    res = {
        "frames": args.frames,
        "length": args.length,
        "validity_agreement": float(((e_tpu != -10) == (e_cpu != -10)).mean()),
        "rmse_tpu_vs_cpu_m": rmse_vs_cpu,
        "rmse_tpu_vs_groundtruth_m": float(np.sqrt(np.mean(err ** 2))),
        "medae_tpu_vs_groundtruth_m": float(np.median(np.abs(err))),
        "fused_fraction": float(fused.mean()),
        "target_rmse_m": 0.05,
    }
    print(json.dumps(res, indent=2))
    with open("BENCH_ACCURACY.json", "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()

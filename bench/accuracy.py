"""Accuracy benchmark: TPU replay vs CPU-reference replay vs ground truth.

The north-star accuracy target (BASELINE.md): elevation RMSE vs the CPU
reference < 5 cm on a replay.  Runs the same frame sequence through the
jitted step on the accelerator — with the PRODUCTION fuse backend (the one
`auto` resolves, i.e. the shipped default; round-2 verdict weak #3: the
harness used to score a superseded backend) and optionally every other
backend — and on the CPU backend with the `segment` oracle-validated path,
compares the final elevation planes on co-fused cells, and also scores both
against the synthetic world's ground truth.  Writes a JSON record (dated
/tmp path unless --out) with the backend/date/method it actually measured;
the committed BENCH_ACCURACY.json is a deliberate promotion of such
records across geometries (L=128 dense + L=1000 flagship).

Usage: python bench/accuracy.py [--frames 60] [--length 128]
                                [--backends stream,pallas,segment,sort]
"""

from __future__ import annotations

import argparse
import datetime
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def default_out_path(arg_out: str, now=None) -> str:
    """Out-path contract (mirrors bench.py --commit-detail hygiene): an
    unspecified --out goes to a dated /tmp path so ad-hoc runs can never
    clobber the committed multi-geometry BENCH_ACCURACY.json."""
    if arg_out:
        return arg_out
    import time as _time
    return _time.strftime("/tmp/BENCH_ACCURACY_%Y%m%d_%H%M%S.json",
                          now or _time.localtime())


def _final_state(cfg, frames, device, fuse_backend, feature_backend="xla"):
    import jax

    from gem_tpu.mapping.pipeline import init_pipeline_state, step

    f = jax.jit(functools.partial(step, cfg=cfg, fuse_backend=fuse_backend,
                                  feature_backend=feature_backend),
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
    ap.add_argument("--backends", default="",
                    help="comma list; default = the production backend "
                         "resolve_backend() picks, i.e. what users run")
    ap.add_argument("--feature-backend", default="xla",
                    help="feature backend for the DEVICE replay (the bench "
                         "rows ship pallas; features feed traver which "
                         "gates raytrace deletions, so flagship-geometry "
                         "accuracy should measure the shipped path)")
    ap.add_argument("--out", default="",
                    help="output JSON path; default = a dated /tmp path so "
                         "ad-hoc runs can never clobber the committed "
                         "BENCH_ACCURACY.json (same hygiene contract as "
                         "bench.py --commit-detail; the committed artifact "
                         "is a deliberate multi-geometry promotion)")
    args = ap.parse_args()

    import jax

    # persistent compile cache (same contract as bench/probe.py worker):
    # L=1000 step compiles cost minutes on this box; MUST be configured via
    # jax.config.update, not env vars (sitecustomize pre-imports jax —
    # CLAUDE.md / PROFILE_r4.md root cause)
    if os.environ.get("GEM_AXON_CACHE", "1") != "0":
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/tmp/gem_tpu_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from gem_tpu.config import (BodyFilterConfig, MapConfig, PipelineConfig,
                                SensorConfig)
    from gem_tpu.core import index_math as im
    from gem_tpu.io.replay import synthetic_frames
    from gem_tpu.mapping.calibrate import resolve_backend

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

    dev = jax.devices()[0]
    production = resolve_backend("tpu" if dev.platform != "cpu" else "cpu")
    backends = ([b for b in args.backends.split(",") if b]
                or [production])

    cpu = jax.devices("cpu")[0]
    s_cpu = _final_state(cfg, frames, cpu, "segment")
    e_cpu = np.asarray(s_cpu.map.elevation)

    res = {
        "frames": args.frames,
        "length": args.length,
        "method": "final elevation plane after jitted replay, per backend, "
                  "vs CPU segment reference on co-fused cells",
        "device": str(dev),
        "device_platform": dev.platform,
        "production_backend": production,
        "reference_backend": "segment (cpu)",
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
        "target_rmse_m": 0.05,
        "backends": {},
    }

    L = cfg.map.length
    import jax.numpy as jnp

    g = jnp.arange(L)
    sx = jnp.repeat(g, L)
    sy = jnp.tile(g, L)

    res["feature_backend_device"] = args.feature_backend
    for be in backends:
        s_dev = _final_state(cfg, frames, dev, be,
                             feature_backend=args.feature_backend)
        e_dev = np.asarray(s_dev.map.elevation)
        both = (e_dev != -10) & (e_cpu != -10)
        row = {
            "validity_agreement": float(
                ((e_dev != -10) == (e_cpu != -10)).mean()),
            "rmse_vs_cpu_m": float(
                np.sqrt(np.mean((e_dev[both] - e_cpu[both]) ** 2))),
            "max_abs_vs_cpu_m": float(np.max(np.abs(e_dev[both]
                                                    - e_cpu[both]))),
        }
        gx, gy = im.storage_to_geo(sx, sy, s_dev.map.start, L)
        px, py = im.geo_index_to_position(gx, gy, s_dev.map.center, L,
                                          cfg.map.resolution)
        gt = world.height(np.asarray(px), np.asarray(py)).reshape(-1)
        fused = (e_dev.reshape(-1) != -10)
        err = e_dev.reshape(-1)[fused] - gt[fused]
        row["rmse_vs_groundtruth_m"] = float(np.sqrt(np.mean(err ** 2)))
        row["medae_vs_groundtruth_m"] = float(np.median(np.abs(err)))
        row["fused_fraction"] = float(fused.mean())
        res["backends"][be] = row
        print(f"  {be}: rmse_vs_cpu={row['rmse_vs_cpu_m']:.2e} m, "
              f"rmse_vs_gt={row['rmse_vs_groundtruth_m']:.3f} m",
              file=sys.stderr, flush=True)

    # headline = the production backend's numbers (back-compat keys)
    head = res["backends"][backends[0]]
    res["fuse_backend"] = backends[0]
    res["rmse_tpu_vs_cpu_m"] = head["rmse_vs_cpu_m"]
    res["rmse_tpu_vs_groundtruth_m"] = head["rmse_vs_groundtruth_m"]
    res["validity_agreement"] = head["validity_agreement"]

    print(json.dumps(res, indent=2))
    out_path = default_out_path(args.out)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()

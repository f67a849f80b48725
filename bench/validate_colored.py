"""On-chip COLORED-stream accuracy: TPU stream vs CPU segment, with colors.

The committed BENCH_ACCURACY.json geometries replay COLORLESS synthetic
frames (io/replay.synthetic_frames attaches colors=0), so the colored
kernel path — the segmented-lane color argmin (GEM_FUSE_COLOR=scan) and
the fact kernel's placement dot, kernels/fuse_stream.py — was hardware-
validated only through interpret-mode unit tests plus colorless height
replays.  This harness replays the same synthetic drive with packed-RGB
colors attached to a mixed ~70% of point lanes (exercising the
colorless-chunk gate, mixed-presence statistics, and the intensity
co-payload) and compares BOTH the elevation and the packed-color planes
against the CPU `segment` oracle backend.

Expected: bit-identical color planes on co-fused cells up to the
documented stream/segment exact-f32-height-tie corner (PARITY.md, final
round-5 row; fuzz-bounded by tests/test_fuse_stream.py) — measured here
as a mismatch fraction, expected 0 on generic (non-adversarial) streams.

Reference anchor: G_fuse's color propagation, gpu_process.cu:488-531
(sequential last-writer-wins race -> deterministic min-variance rule,
PARITY.md).

Usage: python bench/validate_colored.py [--frames 60] [--length 128]
Writes bench/results/round5/acc_colored_l{length}.json unless --out.
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "bench"))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--length", type=int, default=128)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--colored-fraction", type=float, default=0.7)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    if os.environ.get("GEM_AXON_CACHE", "1") != "0":
        # jax.config.update, NOT env vars (sitecustomize pre-imports jax)
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/tmp/gem_tpu_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from accuracy import _final_state  # bench/accuracy.py

    from gem_tpu.config import (BodyFilterConfig, MapConfig, PipelineConfig,
                                SensorConfig)
    from gem_tpu.io.replay import synthetic_frames
    from gem_tpu.mapping.calibrate import resolve_backend

    cfg = PipelineConfig(
        map=MapConfig(length=args.length, resolution=0.1,
                      max_shift_cells=16),
        sensor=SensorConfig(model="laser", min_radius=0.01),
        body_filter=BodyFilterConfig(mode="none"),
        max_points=args.points,
    )
    rng = np.random.default_rng(17)
    frames = []
    for fr, _, _ in synthetic_frames(cfg, args.frames,
                                     n_points=args.points, speed=0.15,
                                     noise=0.005, seed=11):
        col = rng.integers(1, 1 << 24, size=fr.colors.shape,
                           dtype=np.int64).astype(np.int32)
        col[rng.random(col.shape) >= args.colored_fraction] = 0  # 0 = none
        frames.append(dataclasses.replace(fr, colors=col))

    dev = jax.devices()[0]
    production = resolve_backend("tpu" if dev.platform != "cpu" else "cpu")
    cpu = jax.devices("cpu")[0]

    s_dev = _final_state(cfg, frames, dev, production)
    s_cpu = _final_state(cfg, frames, cpu, "segment")

    e_dev = np.asarray(s_dev.map.elevation)
    e_cpu = np.asarray(s_cpu.map.elevation)
    c_dev = np.asarray(s_dev.map.color)
    c_cpu = np.asarray(s_cpu.map.color)
    both = (e_dev != -10) & (e_cpu != -10)

    res = {
        "method": "colored synthetic replay: TPU production stream vs CPU "
                  "segment oracle; elevation RMSE + packed-color plane "
                  "comparison on co-fused cells",
        "device": str(dev),
        "device_platform": dev.platform,
        "production_backend": production,
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
        "frames": args.frames,
        "length": args.length,
        "colored_fraction_lanes": args.colored_fraction,
        "validity_agreement": float(((e_dev != -10) == (e_cpu != -10))
                                    .mean()),
        "rmse_vs_cpu_m": float(np.sqrt(np.mean(
            (e_dev[both] - e_cpu[both]) ** 2))),
        "max_abs_vs_cpu_m": float(np.max(np.abs(e_dev[both] - e_cpu[both]))),
        "color_cells_compared": int(both.sum()),
        "color_cells_colored_cpu": int((c_cpu[both] != 0).sum()),
        "color_mismatch_fraction": float((c_dev[both] != c_cpu[both])
                                         .mean()),
        "color_mismatch_count": int((c_dev[both] != c_cpu[both]).sum()),
    }
    print(json.dumps(res, indent=2))
    out = args.out or os.path.join(
        REPO, "bench", "results", "round5",
        f"acc_colored_l{args.length}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()

"""Per-kernel microbenchmarks on the live device.

Usage: python bench/kernels.py [--length 1000] [--points 1048576]

Each phase is timed in its OWN subprocess: the tunneled axon runtime in this
image degrades ~1000x as soon as a second executable is loaded in a process
(first program: ~0.17 ms/step; after loading another: ~200 ms/step with
output-size-proportional cost), so multi-program timing in one process
measures the relay, not the TPU.  Results land in BENCH_KERNELS.json.

CAVEAT on isolated pointproc/fuse numbers: standalone, their 1M-segment
scatter ops lower to XLA's serial scatter path (~30-140 ms); compiled into
the full step the same operations vectorise and the ENTIRE frame runs in
~0.2 ms (verified correct against the CPU backend).  Treat `step_*` as the
ground truth; the isolated rows only bound worst-case kernel lowering.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PHASES = ("move", "pointproc", "fuse_segment", "fuse_sort", "features",
          "raytrace", "step_segment", "step_sort")


def timeit(fn, *args, iters=30, warmup=3, trials=3):
    """Min-of-trials mean (robust to episodic relay contention)."""
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def run_phase(phase: str, length: int, points: int, iters: int) -> float:
    import jax

    from gem_tpu.config import benchmark_config
    from gem_tpu.io.replay import synthetic_frames
    from gem_tpu.mapping.pipeline import init_pipeline_state, step

    cfg = benchmark_config(length=length, max_points=points)
    state0 = jax.device_put(init_pipeline_state(cfg))
    frame, _, _ = next(iter(synthetic_frames(cfg, 1, n_points=points,
                                             max_range=length * 0.05)))
    frame = jax.device_put(frame)
    jax.block_until_ready((state0, frame))
    ms = state0.map

    if phase == "move":
        from gem_tpu.core.move import move

        f = jax.jit(lambda s, p: move(s, cfg.map, p))
        return timeit(f, ms, frame.track_position, iters=iters)

    if phase == "pointproc":
        from gem_tpu.kernels.pointproc import process_points
        from gem_tpu.sensors.models import jacobian_ingredients

        sj, c_sb, p_bm, skew = jacobian_ingredients(
            frame.r_map_base, frame.r_base_sensor, frame.t_base_sensor)

        def _pp(s, fr):
            return process_points(s, cfg, fr.points, fr.intensity, fr.valid,
                                  fr.transform, fr.t_map_base[2], sj,
                                  fr.pose_cov[3:, 3:], c_sb, p_bm, skew)
        return timeit(jax.jit(_pp), ms, frame, iters=iters)

    if phase.startswith("fuse"):
        # build the batch inside the SAME jitted program (a second loaded
        # executable would poison the measurement; the pointproc part is
        # subtracted via the pointproc phase)
        from gem_tpu.kernels.fuse import fuse
        from gem_tpu.kernels.pointproc import process_points
        from gem_tpu.sensors.models import jacobian_ingredients

        backend = phase.split("_")[1]
        sj, c_sb, p_bm, skew = jacobian_ingredients(
            frame.r_map_base, frame.r_base_sensor, frame.t_base_sensor)

        def _pp_fuse(s, fr):
            batch, lowest = process_points(
                s, cfg, fr.points, fr.intensity, fr.valid, fr.transform,
                fr.t_map_base[2], sj, fr.pose_cov[3:, 3:], c_sb, p_bm, skew)
            return fuse(s.replace(lowest=lowest), cfg, batch,
                        backend=backend)
        return timeit(jax.jit(_pp_fuse), ms, frame, iters=iters)

    if phase == "features":
        from gem_tpu.kernels.features import compute_features

        f = jax.jit(lambda s: compute_features(s, cfg.map))
        return timeit(f, ms, iters=iters)

    if phase == "raytrace":
        from gem_tpu.kernels.raytrace import raytrace_cleanup

        f = jax.jit(lambda s: raytrace_cleanup(s, cfg.map, s.traver))
        return timeit(f, ms, iters=iters)

    if phase.startswith("step"):
        backend = phase.split("_")[1]
        f = jax.jit(functools.partial(step, cfg=cfg, fuse_backend=backend))
        return timeit(f, state0, frame, iters=iters)

    raise ValueError(phase)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--length", type=int, default=1000)
    ap.add_argument("--points", type=int, default=1048576)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--phase", choices=PHASES)
    args = ap.parse_args()

    if args.phase:
        dt = run_phase(args.phase, args.length, args.points, args.iters)
        print(json.dumps({args.phase: dt * 1e3}))
        return

    # parent never imports jax: an idle client attached to the relay can
    # still perturb the children's measurements
    res = {"length": args.length, "points": args.points}
    for phase in PHASES:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--phase", phase, "--length", str(args.length),
               "--points", str(args.points), "--iters", str(args.iters)]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=900)
        if out.returncode != 0:
            res[phase + "_ms"] = f"FAILED: {out.stderr[-200:]}"
            continue
        val = json.loads(out.stdout.strip().splitlines()[-1])[phase]
        res[phase + "_ms"] = round(val, 4)
        print(f"  {phase}: {val:.4f} ms", file=sys.stderr, flush=True)

    print(json.dumps(res, indent=2))
    with open("BENCH_KERNELS.json", "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()

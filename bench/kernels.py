"""Per-component timings via the full-step ABLATION matrix (slope-timed).

Round-1 postmortem: this file used `block_until_ready` loops, which through
the axon relay returned 3-4 orders of magnitude too fast, and its docstring
told readers to trust exactly the artifact.  Isolated single-kernel
programs also lower differently from the same kernel compiled into the full
step (XLA fusion context changes what scatter/sort become), so the only
honest per-component number is a DIFFERENCE of full-step measurements:

    cost(component) ~= step_ms(all on) - step_ms(component off)

Every row comes from bench/probe.py's artifact-proof K-program slope timing
(value fetch, one jitted program per process).  Results land in
BENCH_KERNELS.json; it also records the measured-fastest fuse backend into
FUSE_CALIBRATION.json (consumed by ElevationPipeline's `auto`).

Usage: python bench/kernels.py [--length 1000] [--points 1048576]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE = os.path.join(REPO, "bench", "probe.py")

BACKENDS = ("stream", "segment", "sort", "pallas")
ABLATIONS = (
    ("step_all", {}),
    ("step_nofuse", {"fuse": "none"}),
    ("step_nofeat", {"features": False}),
    ("step_noray", {"raytrace": False}),
    ("step_nolow", {"lowest": False}),
    ("step_nosub", {"submaps": False}),
    ("step_minimal", {"fuse": "none", "features": False, "raytrace": False,
                      "submaps": False, "lowest": False}),
)


def run_worker(spec, timeout=2400):
    t0 = time.time()
    proc = subprocess.run([sys.executable, PROBE, "worker",
                           json.dumps(spec)],
                          capture_output=True, text=True, timeout=timeout,
                          cwd=REPO)
    lines = [ln for ln in proc.stdout.splitlines()
             if ln.startswith("PROBE_RESULT ")]
    if not lines:
        return {"error": (proc.stderr or proc.stdout)[-1500:],
                "wall_s": round(time.time() - t0, 1)}
    out = json.loads(lines[-1][len("PROBE_RESULT "):])
    out["wall_s"] = round(time.time() - t0, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--length", type=int, default=1000)
    ap.add_argument("--points", type=int, default=1048576)
    ap.add_argument("--backends", default=",".join(BACKENDS))
    ap.add_argument("--no-ablate", action="store_true")
    args = ap.parse_args()

    res = {"length": args.length, "points": args.points,
           "method": "slope timing (bench/probe.py), one program/process; "
                     "component costs are full-step ablation differences"}

    # backend shoot-out -> calibration record
    step_ms = {}
    for be in args.backends.split(","):
        row = run_worker({"phase": "step", "fuse": be,
                          "feature_backend": "pallas", "n_frames": 2,
                          "length": args.length, "points": args.points})
        ms = row.get("per_program_ms")
        res[f"step_{be}_ms"] = round(ms, 3) if ms else row.get("error")
        if ms:
            step_ms[be] = round(ms, 3)
        print(f"  step[{be}]: {res[f'step_{be}_ms']} ms", file=sys.stderr,
              flush=True)
    if step_ms:
        best = min(step_ms, key=step_ms.get)
        res["fastest_backend"] = best
        sys.path.insert(0, REPO)
        from gem_tpu.mapping.calibrate import save_record

        # The parent must NEVER initialize a jax client while workers own
        # the relay (CLAUDE.md; round-2 advisor finding) — so resolve the
        # platform in a SUBPROCESS, after all shoot-out workers exited.
        # Hardcoding "tpu" here would let a CPU-box run silently rewrite
        # the shipped TPU default (round-3 review finding).
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; from gem_tpu.mapping.calibrate import "
                 "_platform; print(_platform())"],
                capture_output=True, text=True, timeout=600, cwd=REPO)
            platform = (probe.stdout.strip().splitlines() or [""])[-1]
        except subprocess.TimeoutExpired:
            platform = ""
        res["platform"] = platform or "unknown"
        if platform in ("tpu", "cpu", "gpu"):
            save_record(platform, best, step_ms,
                        context={"length": args.length,
                                 "points": args.points,
                                 "harness": "bench/kernels.py"})
        else:
            print("  platform probe failed; NOT writing FUSE_CALIBRATION",
                  file=sys.stderr)

    if not args.no_ablate and step_ms:
        best = res["fastest_backend"]
        for name, knobs in ABLATIONS:
            if name == "step_all":
                res["step_all_ms"] = step_ms[best]
                continue
            spec = {"phase": "step", "fuse": knobs.get("fuse", best),
                    "feature_backend": "pallas", "n_frames": 2,
                    "length": args.length, "points": args.points}
            spec.update({k: v for k, v in knobs.items() if k != "fuse"})
            row = run_worker(spec)
            ms = row.get("per_program_ms")
            res[name + "_ms"] = round(ms, 3) if ms else row.get("error")
            if ms:
                comp = name.replace("step_no", "")
                cost = round(step_ms[best] - ms, 3)
                res[f"cost_{comp}_ms"] = cost
                if cost < 0:
                    # Ablating a phase can SLOW the step: XLA reschedules
                    # the whole program around the hole (PROFILE_r5.md
                    # "glue-term audit" — in-step composition cost).  The
                    # isolated per-kernel probes (bench/probe.py phases,
                    # PROFILE_r5 floor table) are the authoritative cost
                    # for such a phase; flag it rather than publish a
                    # negative cost silently.
                    res[f"cost_{comp}_note"] = (
                        "negative = removing this phase reschedules the "
                        "program (composition effect); see PROFILE_r5.md "
                        "floor table for the isolated cost")
            print(f"  {name}: {res[name + '_ms']} ms", file=sys.stderr,
                  flush=True)

    print(json.dumps(res, indent=2))
    with open(os.path.join(REPO, "BENCH_KERNELS.json"), "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()

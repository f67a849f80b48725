"""Benchmark harness — ALWAYS prints ONE JSON line with the headline metric.

Timing method (artifact-proof, see bench/probe.py): through this image's
tunneled axon relay, `block_until_ready` can return before the program has
executed, which inflated round-1 numbers by 3-4 orders of magnitude.  The
only trustworthy clock is K-chained-program SLOPE timing with a VALUE fetch:

    per-program time = (min t(K_hi) - min t(K_lo)) / (K_hi - K_lo)

where t(K) dispatches K data-dependent programs and np.asarray's a scalar
from the last one.  Every phase runs in its own subprocess (the relay
degrades ~1000x once a second executable loads in a process), and a control
matmul with known FLOPs must hit >100 TFLOP/s in the same harness or the
run is flagged unhealthy.

Wall-budget contract (round-2 postmortem: BENCH_r02 was rc=124 with empty
output because six sequential phases each cost 100-1100 s of compile):
  * hard deadline, default 480 s (env GEM_BENCH_BUDGET_S or --budget);
  * phases run in priority order — the two north-star rows first
    (Hz @ 1000x1000 strict, then points/s on the big LiDAR frame);
  * each phase's subprocess timeout is the remaining budget;
  * the one-line JSON is printed with whatever completed ("partial": true
    for incomplete runs) and the process exits 0 — SIGTERM/SIGINT from an
    outer `timeout` also triggers the emit instead of dying silently;
  * workers use a persistent JAX compilation cache (/tmp) so repeated runs
    skip the 100-1000 s compiles.

Headline = points fused per second; vs_baseline = value / 100e6.
Details (Hz rows, control, per-phase) stream to BENCH_DETAIL.json + stderr.
Extra rows (ref-cadence Hz, scan replay) only run with --full.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
PROBE = os.path.join(REPO, "bench", "probe.py")
MARGIN_S = 15        # reserved for final emit/IO
MIN_PHASE_S = 45     # don't start a phase with less than this left


_current_worker = None   # in-flight probe subprocess, killed on signal:
# orphaning it would leave a TPU-attached process running into the NEXT
# benchmark (CLAUDE.md: never two TPU-using processes concurrently)


def run_worker(spec: dict, timeout: float) -> dict:
    """One probe phase in its own subprocess (one jitted program each)."""
    global _current_worker
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, PROBE, "worker", json.dumps(spec)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO)
    _current_worker = proc
    try:
        stdout, stderr = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.kill()
        try:
            _, stderr = proc.communicate(timeout=10)
        except subprocess.TimeoutExpired:
            stderr = ""
        return {"error": f"phase timeout after {timeout:.0f}s",
                "stderr_tail": (stderr or "")[-500:],
                "wall_s": round(time.time() - t0, 1)}
    finally:
        _current_worker = None
    lines = [ln for ln in stdout.splitlines()
             if ln.startswith("PROBE_RESULT ")]
    if not lines:
        return {"error": (stderr or stdout)[-2000:],
                "wall_s": round(time.time() - t0, 1)}
    out = json.loads(lines[-1][len("PROBE_RESULT "):])
    out["wall_s"] = round(time.time() - t0, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--full", action="store_true",
                    help="also run ref-cadence Hz, 1M strict and scan rows")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("GEM_BENCH_BUDGET_S", 480)))
    ap.add_argument("--length", type=int, default=0)
    ap.add_argument("--fuse-backend", default="auto")
    ap.add_argument("--commit-detail", action="store_true",
                    help="write the detail JSON to the COMMITTED "
                         "BENCH_DETAIL.json (only for deliberate captures)")
    ap.add_argument("--detail-out", default="",
                    help="where to write the detail JSON; default is a "
                         "dated /tmp path so ad-hoc/driver runs can never "
                         "clobber the committed BENCH_DETAIL.json "
                         "(round-4 verdict: the driver's own run did)")
    args = ap.parse_args()
    if not args.detail_out:
        args.detail_out = (
            os.path.join(REPO, "BENCH_DETAIL.json") if args.commit_detail
            else time.strftime("/tmp/BENCH_DETAIL_%Y%m%d_%H%M%S.json"))

    t_start = time.time()
    deadline = t_start + args.budget
    quick = args.quick
    length = args.length or (256 if quick else 1000)
    hz_points = 16384 if quick else 131072
    tp_points = 65536 if quick else 1048576
    big_points = tp_points * 4

    backend = args.fuse_backend
    if backend == "auto":
        from gem_tpu.mapping.calibrate import resolve_backend
        backend = resolve_backend("tpu")  # bench always runs on the TPU host; avoid initializing a jax client in the parent (workers own the device)

    detail = {"method": "K-program slope timing with value fetch "
                        "(bench/probe.py), one program per process",
              "fuse_backend": backend, "budget_s": args.budget,
              "n_points_hz_frame": hz_points,
              "n_points_throughput_frame": tp_points}
    state = {"points_per_sec": 0.0, "hz": None, "hz_ref": None,
             "pts_colored": None,
             "phases_done": [], "phases_skipped": [], "phases_errored": [],
             "emitted": False}

    def write_detail():
        with open(args.detail_out, "w") as f:
            json.dump(detail, f, indent=2)

    def emit(partial: bool, reason: str | None = None):
        if state["emitted"]:
            return
        state["emitted"] = True
        out = {
            "metric": "points_fused_per_sec",
            "value": round(state["points_per_sec"]),
            "unit": "points/s",
            "vs_baseline": round(state["points_per_sec"] / 100e6, 4),
        }
        if state["hz"]:
            out["hz_at_%dx%d_strict" % (length, length)] = round(
                state["hz"], 1)
        if state["hz_ref"]:
            out["hz_at_%dx%d_ref_cadence" % (length, length)] = round(
                state["hz_ref"], 1)
        if state["pts_colored"]:
            out["points_per_sec_colored"] = round(state["pts_colored"])
        if partial:
            out["partial"] = True
            out["phases_done"] = state["phases_done"]
            out["phases_skipped"] = state["phases_skipped"]
            out["phases_errored"] = state["phases_errored"]
            if state.get("phases_skipped_optional"):
                out["phases_skipped_optional"] = \
                    state["phases_skipped_optional"]
            if reason:
                out["partial_reason"] = reason
        if detail.get("relay_precheck_failed"):
            out["relay_precheck_failed"] = True
        if detail.get("round3_preempt_timeout"):
            out["tpu_contention"] = True
        detail["partial"] = partial
        detail["wall_total_s"] = round(time.time() - t_start, 1)
        try:
            write_detail()
        except OSError:
            pass
        print(json.dumps(out), flush=True)

    def on_signal(signum, frame):
        print(f"bench.py: caught signal {signum}, emitting partial result",
              file=sys.stderr, flush=True)
        if _current_worker is not None:       # don't orphan a TPU process
            try:
                _current_worker.kill()
            except OSError:
                pass
        emit(partial=True, reason=f"signal {signum}")
        os._exit(0)

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)

    def budget_left():
        return deadline - time.time() - MARGIN_S

    def run_phase(name: str, spec: dict, optional: bool = False) -> \
            dict | None:
        left = budget_left()
        if left < MIN_PHASE_S:
            # budget-skipping an OPTIONAL (bonus) row is expected behavior,
            # not a partial capture — only the priority rows gate partial
            key = "phases_skipped_optional" if optional else "phases_skipped"
            state.setdefault(key, []).append(name)
            detail.setdefault("skipped", []).append(name)
            return None
        row = run_worker(dict(spec, name=name), timeout=left)
        detail.setdefault("phase_walls_s", {})[name] = row.get("wall_s")
        if "error" in row:
            detail[name + "_error"] = row["error"]
            state["phases_errored"].append(name)
        else:
            state["phases_done"].append(name)
        try:
            write_detail()     # progressive: survive a hard kill
        except OSError:
            pass
        print(f"bench.py: {name}: "
              f"{row.get('per_program_ms', row.get('tflops', 'ERR'))} "
              f"(wall {row.get('wall_s')}s, budget left {budget_left():.0f}s)",
              file=sys.stderr, flush=True)
        return row

    # --- preempt a round3.sh A/B run holding the TPU ----------------------
    # bench/round3.sh (launched automatically on relay recovery) can hold
    # the chip for hours; two TPU-attached processes poison each other's
    # timings (CLAUDE.md).  The driver's capture outranks the A/B run, so
    # ask it to yield (it traps SIGTERM, kills its in-flight worker and
    # removes the lock) and wait briefly for a clean handoff.
    # (round3.sh itself invokes bench.py; GEM_ROUND3_SELF marks that call
    # so it doesn't SIGTERM its own parent)
    # A run whose budget can never reach the chip (e.g. the zero-budget
    # contract test) must not preempt either: it has nothing to contend.
    r3_lock = "/tmp/gem_round3.pid"
    if (os.path.exists(r3_lock) and not os.environ.get("GEM_ROUND3_SELF")
            and budget_left() >= MIN_PHASE_S):
        try:
            with open(r3_lock) as f:
                r3_pid = int(f.read().strip())
        except (OSError, ValueError):
            r3_pid = 0

        def _is_round3(pid: int) -> bool:
            # PID-reuse guard: only signal a process that really is a
            # round sweep (a stale lock must never kill a bystander).
            # Matches round3.sh and any later bench/roundN*.sh that
            # adopts the same lock protocol.
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read()
                    return b"round3.sh" in cmd or b"round4" in cmd \
                        or b"round5" in cmd
            except OSError:
                return False

        if r3_pid and _is_round3(r3_pid):
            try:
                os.kill(r3_pid, signal.SIGTERM)
            except OSError:
                pass
            print(f"bench.py: preempting round3.sh (pid {r3_pid}); "
                  "waiting for it to yield the TPU", file=sys.stderr,
                  flush=True)
            t_wait = time.time()
            alive = True
            while time.time() - t_wait < 90:
                alive = _is_round3(r3_pid)
                if not alive:
                    break
                time.sleep(2)
            detail["preempted_round3"] = True
            detail["round3_yield_s"] = round(time.time() - t_wait, 1)
            if alive:
                # it never yielded — a chip-attached process is still out
                # there, so every number below is suspect (CLAUDE.md)
                detail["round3_preempt_timeout"] = True
                print("bench.py: round3.sh did NOT yield within 90s — "
                      "timings below may be contended", file=sys.stderr,
                      flush=True)
        else:
            try:                     # stale lock (dead or recycled PID)
                os.unlink(r3_lock)
            except OSError:
                pass

    # --- control-matmul precheck (relay health, CLAUDE.md timing rule) ----
    # Runs FIRST so every emitted headline carries a health verdict:
    # known-FLOPs matmul must hit >100 TFLOP/s in this same harness, else
    # the relay is in its 1000x-slow or hung mode and the numbers are
    # flagged.  A healthy relay finishes this well inside the timeout
    # (round-2 wall ~60-120 s incl. compile); the hung-client outage mode
    # fails fast here instead of burning the whole budget on the first
    # step phase.
    pre = ({"error": "skipped: budget too small"}
           if budget_left() < MIN_PHASE_S else
           run_worker({"name": "matmul_ctl", "phase": "matmul",
                       "dim": 4096 if quick else 8192},
                      timeout=min(240.0, max(args.budget / 3, 60.0))))
    if "error" in pre and not pre["error"].startswith("skipped") \
            and budget_left() >= MIN_PHASE_S:
        # One transient-tolerant retry at a quarter of the work: the
        # round-4 full run hit a one-off >240 s wall on the 8192 control
        # (relay warmup burst) while every subsequent phase was healthy —
        # a single slow compile must not brand the whole capture.
        pre = run_worker({"name": "matmul_ctl", "phase": "matmul",
                          "dim": 4096},
                         timeout=min(180.0, max(args.budget / 4, 60.0)))
        pre["retried_at_dim"] = 4096
    detail.setdefault("phase_walls_s", {})["matmul_ctl"] = pre.get("wall_s")
    if "error" in pre and pre["error"].startswith("skipped"):
        # never probed (budget too small) — that is NOT a relay verdict
        detail["relay_precheck_skipped"] = True
        state["phases_skipped"].append("matmul_ctl")
    elif "error" in pre:
        # The precheck AND its reduced-work retry both failed: the relay is
        # hung or dead-slow, so any numbers below are suspect.  Mark the
        # run partial (advisor round-4: a slow-but-alive relay can complete
        # metric phases with quietly pessimistic numbers) in addition to
        # the top-level relay_precheck_failed flag emit() already adds.
        detail["relay_precheck_failed"] = True
        detail["relay_precheck_error"] = pre["error"]
        state["phases_errored"].append("matmul_ctl")
        print("bench.py: control-matmul precheck FAILED (client hang or "
              "dead-slow relay) — continuing with remaining budget; "
              "run will be marked partial", file=sys.stderr, flush=True)
    else:
        state["phases_done"].append("matmul_ctl")
        detail["control_matmul_tflops"] = pre.get("tflops")
        detail["relay_healthy"] = bool((pre.get("tflops") or 0) > 100)
        if not detail["relay_healthy"]:
            print(f"WARNING: control matmul {pre.get('tflops')} TFLOP/s "
                  "(<100): relay/chip unhealthy, numbers suspect",
                  file=sys.stderr, flush=True)

    step_common = {"phase": "step", "fuse": backend,
                   "feature_backend": "pallas", "length": length,
                   "n_frames": 2}

    # --- priority 1: Hz @ 1000x1000, realistic frame, STRICT --------------
    # strict = raytrace visibility cleanup EVERY frame (the reference runs
    # its cleanup thread at 1 Hz against a 10 Hz sensor, README.md:236-246,
    # so this cadence cleans 10x more often than the reference even at
    # equal frame rates).
    row = run_phase("step_hz_strict", dict(
        step_common, points=hz_points, k_lo=4, k_hi=24, trials=3))
    if row and row.get("per_program_ms"):
        ms = row["per_program_ms"]
        detail["step_ms_at_%dk_pts" % (hz_points // 1024)] = ms
        detail["map_update_hz_at_%dx%d" % (length, length)] = 1e3 / ms
        state["hz"] = 1e3 / ms
        state["points_per_sec"] = max(state["points_per_sec"],
                                      hz_points / (ms * 1e-3))

    # --- priorities 2+3: the two points/s rows ----------------------------
    # 2: big LiDAR-only frame at ref cadence — 4M points, camera-less (the
    #    reference's YQ demo configuration), raytrace every 10th frame:
    #    large N amortises fixed per-frame work, the honest way to measure
    #    a POINTS/S figure (the Hz row covers per-frame latency).
    # 3: 1M camera-on frame, STRICT (raytrace every frame).
    # BENCH_r03 postmortem: phase wall is ~90% cold compile, so K/trials
    # trims barely move it — the budget planner instead (a) predicts each
    # phase's wall from the committed BENCH_DETAIL of the last full run,
    # (b) when both rows don't fit the remaining budget, runs the STRICT
    # row first (the round-4 target; the big row is historically stable)
    # with floor-size measure loops.  The structural fix is the warm
    # persistent compile cache (bench/probe.py forces it open for the
    # axon platform; prewarmed by the end-of-round --full run).
    prior_walls = {}
    try:
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
            prior_walls = json.load(f).get("phase_walls_s") or {}
    except (OSError, ValueError):
        pass

    def est(name, default):
        w = prior_walls.get(name)
        return w if isinstance(w, (int, float)) and w > 0 else default

    strict_spec = dict(step_common, points=tp_points,
                       k_lo=2, k_hi=12, trials=3)
    big_spec = dict(step_common, points=big_points, raytrace_every=10,
                    color=False, k_lo=2, k_hi=8, trials=3)
    if budget_left() < est("step_tp_strict", 200) + est("step_tp_big", 130):
        strict_spec.update(k_hi=8, trials=2)
        big_spec.update(k_hi=6, trials=2)
        tp_order = [("step_tp_strict", strict_spec),
                    ("step_tp_big", big_spec)]
        detail["tp_phase_plan"] = "tight-budget: strict first, floor loops"
    else:
        tp_order = [("step_tp_big", big_spec),
                    ("step_tp_strict", strict_spec)]

    for tp_name, tp_spec in tp_order:
        row = run_phase(tp_name, tp_spec)
        if not (row and row.get("per_program_ms")):
            continue
        ms = row["per_program_ms"]
        if tp_name == "step_tp_big":
            detail["step_ms_at_%dM_pts_ref_cadence_lidar" %
                   max(big_points // (1 << 20), 1)] = ms
            detail["points_per_sec_big_ref_cadence_lidar"] = \
                big_points / (ms * 1e-3)
            state["points_per_sec"] = max(state["points_per_sec"],
                                          big_points / (ms * 1e-3))
        else:
            detail["step_ms_at_%dM_pts" % max(tp_points // (1 << 20), 1)] \
                = ms
            detail["points_per_sec_step"] = tp_points / (ms * 1e-3)
            state["points_per_sec"] = max(state["points_per_sec"],
                                          tp_points / (ms * 1e-3))

    # --- priority 4: genuinely colored 1M frame (synthetic colors on every
    # valid lane): the strict camera row above carries the color MACHINERY
    # but a colorless stream (like the reference's fake_image mode); real
    # camera replay (KITTI colorized) pays the color statistics on every
    # chunk — this row measures that.  Runs whenever budget remains (the
    # round-4 driver run finished the three priority rows with 219 s of
    # warm-cache headroom; run_phase budget-gates it regardless).
    row = run_phase("step_tp_colored", dict(
        step_common, points=tp_points, colored=1,
        k_lo=2, k_hi=12, trials=3), optional=True)
    if row and row.get("per_program_ms"):
        ms = row["per_program_ms"]
        detail["step_ms_at_%dM_pts_colored"
               % max(tp_points // (1 << 20), 1)] = ms
        detail["points_per_sec_colored"] = tp_points / (ms * 1e-3)
        state["pts_colored"] = tp_points / (ms * 1e-3)

    if args.full:
        row = run_phase("step_hz_refcadence", dict(
            step_common, points=hz_points, raytrace_every=10,
            k_lo=4, k_hi=24, trials=3))
        if row and row.get("per_program_ms"):
            ms = row["per_program_ms"]
            detail["step_ms_at_%dk_pts_ref_cadence" % (hz_points // 1024)] = ms
            detail["map_update_hz_ref_cadence"] = 1e3 / ms
            state["hz_ref"] = 1e3 / ms

        row = run_phase("scan_tp", dict(
            step_common, phase="scan", points=tp_points,
            n_frames=4 if quick else 8))
        if row and row.get("per_frame_ms"):
            detail["scan_ms_per_frame"] = row["per_frame_ms"]
            detail["scan_points_per_sec"] = tp_points / (row["per_frame_ms"]
                                                         * 1e-3)
            state["points_per_sec"] = max(state["points_per_sec"],
                                          detail["scan_points_per_sec"])

    partial = (bool(state["phases_skipped"]) or bool(state["phases_errored"])
               or not state["phases_done"])
    print(json.dumps(detail, indent=2), file=sys.stderr)
    emit(partial=partial,
         reason="budget exhausted" if state["phases_skipped"] else None)


if __name__ == "__main__":
    main()

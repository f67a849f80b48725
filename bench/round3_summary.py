"""Summarize a bench/round3.sh run into the decision table.

Reads every PROBE_RESULT line under bench/results/round3/, prints one row
per phase with the derived headline quantities (Hz at the 128k strict row,
M pts/s at the 1M rows) and the A/B deltas against the matching baseline
phase, so the flag decisions (far_pool / GEM_FUSE_COLOR / GEM_FUSE_PASSA /
CHUNK / TILE) are one read.

Usage: python bench/round3_summary.py [results_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys

BASELINES = {
    # phase -> the default-config phase it A/Bs against
    "step_hz_p1": "step_hz_p2",
    "step_hz_p3": "step_hz_p2",
    "step_hz_p4": "step_hz_p2",
    "step_hz_passa_gather": "step_hz_p2",
    "step_hz_color_scan": "step_hz_colored",
    "step_hz_colored": "step_hz_p2",
    "step_1m_passa_gather": "step_1m_p2",
    "step_1m_chunk1024": "step_1m_p2",
    "step_1m_colored": "step_1m_p2",
    "step_1m_color_scan": "step_1m_colored",
    "step_1m_scan_gather": "step_1m_colored",
    "step_1m_scan_nocolor": "step_1m_p2",
    "ray_pool1": "ray_pool2",
    "ray_pool3": "ray_pool2",
    "ray_pool4": "ray_pool2",
    "fusek_1m_gather": ("fusek_1m", "fusek_1m_default"),
    # round3b (shipped-defaults confirmation + remaining levers): every
    # A/B compares against the no-override default row of the same run
    "step_hz_gather": "step_hz_default",
    "step_1m_gather": "step_1m_default",
    "step_1m_colored_default": "step_1m_default",
    "step_hz_tile2048": ("step_hz_p2", "step_hz_default"),
    "step_1m_tile2048": "step_1m_default",
    "step_1m_gather_tile2048": "step_1m_default",
}


def load(results_dir):
    rows = {}
    for path in sorted(glob.glob(os.path.join(results_dir, "*.txt"))):
        name = os.path.splitext(os.path.basename(path))[0]
        with open(path) as f:
            lines = [ln for ln in f if ln.startswith("PROBE_RESULT ")]
        if lines:
            rows[name] = json.loads(lines[-1][len("PROBE_RESULT "):])
    return rows


def main():
    results_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(os.path.dirname(__file__), "results", "round3")
    rows = load(results_dir)
    if not rows:
        print(f"no PROBE_RESULT files under {results_dir}")
        return 1

    ctl = rows.get("matmul_ctl", {})
    if ctl:
        print(f"control matmul: {ctl.get('tflops', '?')} TFLOP/s "
              f"(trust gate: >=100)")

    print(f"{'phase':26s} {'ms/frame':>9s} {'Hz':>7s} {'Mpts/s':>8s} "
          f"{'vs base':>9s}")
    for name in sorted(rows):
        r = rows[name]
        ms = r.get("per_frame_ms") or r.get("per_program_ms")
        if ms is None:
            continue
        pts = r.get("points", 0)
        hz = 1000.0 / ms if ms else float("nan")
        mpts = pts * hz / 1e6 if pts else 0.0
        cands = BASELINES.get(name, ())
        if isinstance(cands, str):
            cands = (cands,)
        base = next((c for c in cands if c in rows), None)
        delta = ""
        if base is not None:
            bms = rows[base].get("per_frame_ms") \
                or rows[base].get("per_program_ms")
            if bms:
                delta = f"{(ms - bms) / bms * 100:+6.1f}%"
        print(f"{name:26s} {ms:9.2f} {hz:7.1f} {mpts:8.1f} {delta:>9s}")

    print("\nnorth stars: >=100 Hz strict (step_hz_* row), "
          ">=100 M pts/s (step_1m_* row x best flags)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

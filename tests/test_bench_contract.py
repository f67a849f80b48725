"""Driver-artifact contract for bench.py (round-2 postmortem: BENCH_r02
was rc=124 with empty output).  bench.py must ALWAYS print exactly one
parseable JSON line and exit 0 — even with no budget and no usable
device — marking the run partial with the phase ledger."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_json_with_zero_budget(tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--quick", "--budget", "1", "--fuse-backend", "stream",
         "--detail-out", str(tmp_path / "detail.json")],
        capture_output=True, text=True, timeout=120, cwd=REPO,
        # never preempt a live round3.sh A/B sweep from inside the test
        # suite (this exact test SIGTERM'd a real sweep once)
        env={**os.environ, "GEM_ROUND3_SELF": "1"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    out = json.loads(lines[0])
    assert out["metric"] == "points_fused_per_sec"
    assert out["unit"] == "points/s"
    assert out["partial"] is True
    # every phase is accounted for: skipped or errored, none silently lost.
    # A budget-starved precheck is SKIPPED, not errored — "errored" would
    # read as a relay-failure verdict for a relay that was never probed.
    assert set(out["phases_skipped"]) == {"matmul_ctl", "step_hz_strict",
                                          "step_tp_big", "step_tp_strict"}
    assert out["phases_errored"] == []

#!/bin/bash
# Round-3 sweep #2: confirm the shipped defaults (far_pool auto=3,
# GEM_FUSE_COLOR=scan with the per-chunk colorless gate, CHUNK=1024 at
# >=1M pts) reproduce the sweep-#1 winners with NO env overrides, then
# A/B the two remaining 1M-row levers: the restructured pass-A gather
# (lane-major prior + operand-congruent indices — sweep #1's variant
# failed Mosaic lowering) and TILE=2048 on top of the new defaults.
# Ends by regenerating the committed BENCH_DETAIL.json and
# FUSE_CALIBRATION.json from the same run (round-2 verdict item 7).
#
# Same infra contract as round3.sh: TPU lock handshake, priority order
# under an overall wall budget, one chip process at a time.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/bench/results/round3b"
mkdir -p "$OUT"
cd "$REPO"

T0=$(date +%s)
BUDGET="${GEM_R3_BUDGET_S:-10800}"
left() { echo $(( BUDGET - ($(date +%s) - T0) )); }

log() { echo "[round3b $(date +%H:%M:%S)] $*" | tee -a "$OUT/run.log"; }

LOCK=/tmp/gem_round3.pid
echo $$ > "$LOCK"
export GEM_ROUND3_SELF=1
CHILD=
kill_tree() {
  [ -n "$CHILD" ] || return 0
  kill -TERM -- "-$CHILD" 2>/dev/null
  wait "$CHILD" 2>/dev/null
  kill -KILL -- "-$CHILD" 2>/dev/null
  CHILD=
}
cleanup() { kill_tree; rm -f "$LOCK"; }
trap 'log "preempted (SIGTERM — yielding the TPU)"; cleanup; exit 143' TERM INT
trap cleanup EXIT

run_tpu() {
  setsid "$@" &
  CHILD=$!
  wait "$CHILD"
  local rc=$?
  CHILD=
  return $rc
}

log "health probe (budget ${BUDGET}s)"
if ! run_tpu timeout 300 python bench/probe.py worker \
     '{"name":"nop","phase":"nop"}' > "$OUT/nop.txt" 2>&1; then
  log "relay unhealthy (nop probe timed out) — aborting"
  exit 1
fi
grep PROBE_RESULT "$OUT/nop.txt" | tee -a "$OUT/run.log"

run_phase() {  # name spec timeout [env...]
  local name="$1" spec="$2" to="${3:-2400}" l
  shift 3 2>/dev/null || shift $#
  l=$(left)
  if [ "$l" -lt 120 ]; then log "SKIP $name (budget exhausted)"; return 1; fi
  [ "$to" -gt "$l" ] && to=$l
  log "phase $name timeout=${to}s left=${l}s $*"
  run_tpu env "$@" timeout "$to" python bench/probe.py worker "$spec" \
    > "$OUT/$name.txt" 2>&1
  grep PROBE_RESULT "$OUT/$name.txt" | tail -1 | tee -a "$OUT/run.log"
}

# 1. control matmul (trust gate for everything below)
run_phase matmul_ctl '{"name":"matmul_ctl","phase":"matmul"}' 1200

# 2. shipped-defaults confirmation (no env overrides).  Expected from
# sweep #1: hz ~8.7 ms (p3 landed), 1m <=17.1 ms (chunk1024 landed AND
# the colorless gate erased scan's +8% ungated colorless regression),
# 1m colored ~20.0 ms (gated scan == sweep-#1 scan on colored frames).
run_phase step_hz_default '{"name":"step_hz_default","phase":"step","fuse":"stream","feature_backend":"pallas","points":131072,"n_frames":2,"k_lo":4,"k_hi":24,"trials":3}' 3000
run_phase step_1m_default '{"name":"step_1m_default","phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"k_lo":2,"k_hi":12,"trials":3}' 3000
run_phase step_1m_colored_default '{"name":"step_1m_colored_default","phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"colored":1,"k_lo":2,"k_hi":12,"trials":3}' 3000

# 3. pass-A gather (restructured post-sweep-#1: lane-major (4, TILE)
# prior + padded operand-congruent index row — the form Mosaic's
# dynamic_gather lowers).  The 1M row is fuse-kernel-bound (12.8 of
# 17 ms), and gather removes the second one-hot build + pass-A dot.
run_phase step_1m_gather '{"name":"step_1m_gather","phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"k_lo":2,"k_hi":12,"trials":3}' 3000 GEM_FUSE_PASSA=gather
run_phase step_hz_gather '{"name":"step_hz_gather","phase":"step","fuse":"stream","feature_backend":"pallas","points":131072,"n_frames":2,"k_lo":4,"k_hi":24,"trials":3}' 3000 GEM_FUSE_PASSA=gather
run_phase fusek_1m_gather '{"name":"fusek_1m_gather","phase":"fusekernel","points":1048576,"k_lo":2,"k_hi":12,"trials":3}' 3000 GEM_FUSE_PASSA=gather

# 4. TILE=2048 on top of the new defaults (sweep #1 measured it only
# against the p2 baseline), both rows, and composed with gather.
run_phase step_hz_tile2048 '{"name":"step_hz_tile2048","phase":"step","fuse":"stream","feature_backend":"pallas","points":131072,"n_frames":2,"k_lo":4,"k_hi":24,"trials":3}' 3000 GEM_FUSE_TILE=2048
run_phase step_1m_tile2048 '{"name":"step_1m_tile2048","phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"k_lo":2,"k_hi":12,"trials":3}' 3000 GEM_FUSE_TILE=2048
run_phase step_1m_gather_tile2048 '{"name":"step_1m_gather_tile2048","phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"k_lo":2,"k_hi":12,"trials":3}' 3000 GEM_FUSE_PASSA=gather GEM_FUSE_TILE=2048

# 5. regenerate the committed records from THIS run (same code path,
# same timestamp): BENCH_DETAIL.json via bench.py --full, then
# FUSE_CALIBRATION.json + BENCH_KERNELS.json via the shoot-out.
if [ "$(left)" -gt 300 ]; then
  log "bench.py --full (regenerates committed BENCH_DETAIL.json)"
  GEM_BENCH_BUDGET_S=$(( $(left) > 2400 ? 2400 : $(left) )) \
    run_tpu timeout $(( $(left) > 2500 ? 2500 : $(left) )) python bench.py \
    --full > "$OUT/bench_full.json" 2> "$OUT/bench_full.err"
  tail -1 "$OUT/bench_full.json" | tee -a "$OUT/run.log"
fi
if [ "$(left)" -gt 600 ]; then
  log "kernels.py shoot-out (regenerates FUSE_CALIBRATION.json)"
  run_tpu timeout $(( $(left) > 7200 ? 7200 : $(left) )) \
    python bench/kernels.py --backends stream,segment --no-ablate \
    > "$OUT/kernels.txt" 2>&1
  tail -5 "$OUT/kernels.txt" | tee -a "$OUT/run.log"
fi

# 6. driver-artifact rehearsal, exactly what the driver runs
if [ "$(left)" -gt 120 ]; then
  log "bench.py rehearsal (default budget)"
  run_tpu timeout 600 python bench.py \
    --detail-out "$OUT/bench_default_detail.json" \
    > "$OUT/bench_default.json" 2> "$OUT/bench_default.err"
  tail -1 "$OUT/bench_default.json" | tee -a "$OUT/run.log"
else
  log "SKIP bench.py rehearsal (budget exhausted)"
fi
if [ "$(left)" -gt 120 ]; then
  log "dryrun_multichip rehearsal"
  run_tpu timeout 600 python -c \
    'import __graft_entry__ as g; g.dryrun_multichip(8)' \
    > "$OUT/dryrun.txt" 2>&1 && tail -1 "$OUT/dryrun.txt" | tee -a "$OUT/run.log"
else
  log "SKIP dryrun rehearsal (budget exhausted)"
fi

log "done"

#!/bin/bash
# Round-3 follow-up: best-combo rows with the A/B winners from round3.sh
# (far_pool=3, GEM_FUSE_COLOR=scan, GEM_FUSE_CHUNK=1024 at >=1M), plus the
# 4M camera-on rows that test whether >=100 M pts/s holds WITHOUT the
# LiDAR-only footnote.  Same lock/preemption discipline as round3.sh.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/bench/results/round3"
mkdir -p "$OUT"
cd "$REPO"

T0=$(date +%s)
BUDGET="${GEM_R3_BUDGET_S:-7200}"
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

log "round3b start (budget ${BUDGET}s)"

# best-combo strict rows (the BENCH_DETAIL headline preview)
run_phase b_hz_best '{"name":"b_hz_best","phase":"step","fuse":"stream","feature_backend":"pallas","points":131072,"n_frames":2,"far_pool":3,"k_lo":4,"k_hi":24,"trials":3}' 3000 GEM_FUSE_COLOR=scan
run_phase b_hz_colored_best '{"name":"b_hz_colored_best","phase":"step","fuse":"stream","feature_backend":"pallas","points":131072,"n_frames":2,"colored":1,"far_pool":3,"k_lo":4,"k_hi":24,"trials":3}' 3000 GEM_FUSE_COLOR=scan
run_phase b_1m_best '{"name":"b_1m_best","phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"far_pool":3,"k_lo":2,"k_hi":12,"trials":3}' 3000 GEM_FUSE_COLOR=scan GEM_FUSE_CHUNK=1024
run_phase b_1m_colored_best '{"name":"b_1m_colored_best","phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"colored":1,"far_pool":3,"k_lo":2,"k_hi":12,"trials":3}' 3000 GEM_FUSE_COLOR=scan GEM_FUSE_CHUNK=1024

# 4M camera-on rows: does >=100 M pts/s hold with the camera path live?
run_phase b_4m_colored_ref '{"name":"b_4m_colored_ref","phase":"step","fuse":"stream","feature_backend":"pallas","points":4194304,"n_frames":2,"colored":1,"far_pool":3,"raytrace_every":10,"k_lo":2,"k_hi":8,"trials":3}' 3600 GEM_FUSE_COLOR=scan GEM_FUSE_CHUNK=1024
run_phase b_4m_colored_strict '{"name":"b_4m_colored_strict","phase":"step","fuse":"stream","feature_backend":"pallas","points":4194304,"n_frames":2,"colored":1,"far_pool":3,"k_lo":2,"k_hi":8,"trials":3}' 3600 GEM_FUSE_COLOR=scan GEM_FUSE_CHUNK=1024
# LiDAR-only headline refresh with the pooled raytrace
run_phase b_4m_lidar_ref '{"name":"b_4m_lidar_ref","phase":"step","fuse":"stream","feature_backend":"pallas","points":4194304,"n_frames":2,"far_pool":3,"raytrace_every":10,"k_lo":2,"k_hi":8,"trials":3}' 3600 GEM_FUSE_COLOR=scan GEM_FUSE_CHUNK=1024

log "round3b done"

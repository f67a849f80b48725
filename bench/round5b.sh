#!/bin/bash
# Round-5b: per-term floor probes for the strict-1M row (VERDICT r4 #2).
#
# The strict-1M step under shipped defaults is fuse-bound; this sweep
# measures the remaining terms so PROFILE_r5.md can derive a floor:
#   - the in-step lax.sort (5 operands, 2 keys) and the per-key delta
#     (what a 1-key pack would save IF it were expressible)
#   - full-step ablation differences for features / raytrace / submaps
#     (per CLAUDE.md, ablation differences are the only trustworthy
#     per-component costs)
#   - shipped-defaults step re-confirms (DMADEPTH=8 + fact auto-picks,
#     which the round-5 sweep's snapshot predated)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/bench/results/round5"
SNAP=/tmp/gem_r5b_tree
mkdir -p "$OUT"

rm -rf "$SNAP" && mkdir -p "$SNAP"
git -C "$REPO" archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"

T0=$(date +%s)
BUDGET="${GEM_R5B_BUDGET_S:-7200}"
left() { echo $(( BUDGET - ($(date +%s) - T0) )); }
log() { echo "[round5b $(date +%H:%M:%S)] $*" | tee -a "$OUT/run5b.log"; }

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
trap 'log "preempted (SIGTERM - yielding the TPU)"; cleanup; exit 143' TERM INT
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
if ! run_tpu timeout 900 python bench/probe.py worker \
     '{"name":"nop","phase":"nop"}' > "$OUT/nop5b.txt" 2>&1; then
  log "relay unhealthy (nop probe timed out) - aborting"
  exit 1
fi
grep PROBE_RESULT "$OUT/nop5b.txt" | tee -a "$OUT/run5b.log"

run_phase() {  # name spec timeout [env...]
  local name="$1" spec="$2" to="${3:-2400}" l
  shift 3 2>/dev/null || shift $#
  l=$(left)
  if [ "$l" -lt 120 ]; then log "SKIP $name (budget exhausted)"; return 1; fi
  [ "$to" -gt "$l" ] && to=$l
  log "phase $name timeout=${to}s left=${l}s $*"
  run_tpu env "$@" timeout "$to" python bench/probe.py worker "$spec" \
    > "$OUT/$name.txt" 2>&1
  grep PROBE_RESULT "$OUT/$name.txt" | tail -1 | tee -a "$OUT/run5b.log"
}

run_phase matmul_ctl5b '{"name":"matmul_ctl5b","phase":"matmul"}' 1200

# --- sort terms @1M (the exact in-step shape: 5 operands, 2 keys) ----------
SL='"phase":"sort_lax","n":1048576'
run_phase sort1m_c5_k2 "{\"name\":\"sort1m_c5_k2\",$SL,\"cols\":5,\"num_keys\":2}" 1800
run_phase sort1m_c5_k1 "{\"name\":\"sort1m_c5_k1\",$SL,\"cols\":5,\"num_keys\":1}" 1800

# --- shipped-defaults step re-confirms (no env overrides) -------------------
ST='"phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"k_lo":2,"k_hi":12,"trials":3'
run_phase step_1m_ship "{\"name\":\"step_1m_ship\",$ST}" 3000

# --- ablation differences off the shipped step ------------------------------
run_phase step_1m_nofeat \
  "{\"name\":\"step_1m_nofeat\",$ST,\"features\":false}" 3000
run_phase step_1m_noray \
  "{\"name\":\"step_1m_noray\",$ST,\"raytrace\":false}" 3000
run_phase step_1m_nosub \
  "{\"name\":\"step_1m_nosub\",$ST,\"submaps\":false}" 3000

# isolated fusek at shipped defaults (d8; the round-5 sweep measured d8
# only via the explicit-env champ phase)
FK='"phase":"fusekernel","points":1048576,"k_lo":2,"k_hi":12,"trials":3'
run_phase fusek_1m_ship "{\"name\":\"fusek_1m_ship\",$FK}" 3000

log "done"

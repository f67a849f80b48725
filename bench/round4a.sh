#!/bin/bash
# Round-4 sweep A: fuse-kernel TILE/CHUNK geometry BELOW the round-3 grid.
#
# Why: at the 1M-pt / 1000^2 operating point each TILE=1024 tile holds
# ~1073 sorted points, so the CHUNK=1024 walk runs TWO chunks per tile with
# the second nearly empty — ~2x of the one-hot builds + MXU dots is waste
# (total kernel work ~ sum over tiles of n_chunks * CHUNK * TILE).  Round-3
# swept TILE UP (1024->4096, tile-count-bound Hz row) but never DOWN where
# the point-bound 1M/4M rows live.  This sweep walks the lower-left of the
# grid on the isolated fusekernel probe, then confirms the best cell at the
# full-step level.
#
# Runs from a snapshot of the committed tree (git archive HEAD) so the
# working tree stays editable during the sweep (CLAUDE.md).  Same TPU lock
# protocol as round3.sh: bench.py preempts us via SIGTERM on the PID in
# /tmp/gem_round3.pid.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/bench/results/round4"
SNAP=/tmp/gem_r4a_tree
mkdir -p "$OUT"

rm -rf "$SNAP" && mkdir -p "$SNAP"
git -C "$REPO" archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"

T0=$(date +%s)
BUDGET="${GEM_R4_BUDGET_S:-10800}"
left() { echo $(( BUDGET - ($(date +%s) - T0) )); }
log() { echo "[round4a $(date +%H:%M:%S)] $*" | tee -a "$OUT/run.log"; }

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
if ! run_tpu timeout 300 python bench/probe.py worker \
     '{"name":"nop","phase":"nop"}' > "$OUT/nop.txt" 2>&1; then
  log "relay unhealthy (nop probe timed out) - aborting"
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

run_phase matmul_ctl '{"name":"matmul_ctl","phase":"matmul"}' 1200

# --- isolated fuse-kernel geometry grid @ 1M pts, 1000^2 ------------------
FK='"phase":"fusekernel","points":1048576,"k_lo":2,"k_hi":12,"trials":3'
run_phase fusek_1m_t1024_c1024 "{\"name\":\"fusek_1m_t1024_c1024\",$FK}" 3000 GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=1024
# pass-A=gather A/B at the same geometry FIRST (VERDICT #1 lever: removes
# the second one-hot build + pass-A dot if Mosaic lowers the lane gather)
run_phase fusek_1m_gather_t1024 "{\"name\":\"fusek_1m_gather_t1024\",$FK}" 3000 GEM_FUSE_PASSA=gather GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=1024
run_phase fusek_1m_t512_c512  "{\"name\":\"fusek_1m_t512_c512\",$FK}" 3000 GEM_FUSE_TILE=512 GEM_FUSE_CHUNK=512
run_phase fusek_1m_t512_c256  "{\"name\":\"fusek_1m_t512_c256\",$FK}" 3000 GEM_FUSE_TILE=512 GEM_FUSE_CHUNK=256
run_phase fusek_1m_t256_c256  "{\"name\":\"fusek_1m_t256_c256\",$FK}" 3000 GEM_FUSE_TILE=256 GEM_FUSE_CHUNK=256
run_phase fusek_1m_gather_t512 "{\"name\":\"fusek_1m_gather_t512\",$FK}" 3000 GEM_FUSE_PASSA=gather GEM_FUSE_TILE=512 GEM_FUSE_CHUNK=512
run_phase fusek_1m_gather_t256 "{\"name\":\"fusek_1m_gather_t256\",$FK}" 3000 GEM_FUSE_PASSA=gather GEM_FUSE_TILE=256 GEM_FUSE_CHUNK=256
run_phase fusek_1m_t512_c1024 "{\"name\":\"fusek_1m_t512_c1024\",$FK}" 3000 GEM_FUSE_TILE=512 GEM_FUSE_CHUNK=1024
run_phase fusek_1m_t1024_c512 "{\"name\":\"fusek_1m_t1024_c512\",$FK}" 3000 GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=512
run_phase fusek_1m_t768_c768  "{\"name\":\"fusek_1m_t768_c768\",$FK}" 3000 GEM_FUSE_TILE=768 GEM_FUSE_CHUNK=768
run_phase fusek_1m_t128_c128  "{\"name\":\"fusek_1m_t128_c128\",$FK}" 3000 GEM_FUSE_TILE=128 GEM_FUSE_CHUNK=128

# --- step-level confirms at the promising cells ----------------------------
ST='"phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"k_lo":2,"k_hi":12,"trials":3'
run_phase step_1m_t512_c512 "{\"name\":\"step_1m_t512_c512\",$ST}" 3000 GEM_FUSE_TILE=512 GEM_FUSE_CHUNK=512
run_phase step_1m_gather_t512 "{\"name\":\"step_1m_gather_t512\",$ST}" 3000 GEM_FUSE_PASSA=gather GEM_FUSE_TILE=512 GEM_FUSE_CHUNK=512
run_phase step_1m_t256_c256 "{\"name\":\"step_1m_t256_c256\",$ST}" 3000 GEM_FUSE_TILE=256 GEM_FUSE_CHUNK=256
run_phase step_1m_t512_c256 "{\"name\":\"step_1m_t512_c256\",$ST}" 3000 GEM_FUSE_TILE=512 GEM_FUSE_CHUNK=256

# --- fully-colored 1M row (camera on, real rgb): the >=80 M pts/s target ---
SC='"phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"colored":true,"n_frames":2,"k_lo":2,"k_hi":12,"trials":3'
run_phase step_1m_col_default "{\"name\":\"step_1m_col_default\",$SC}" 3000
run_phase step_1m_col_t512 "{\"name\":\"step_1m_col_t512\",$SC}" 3000 GEM_FUSE_TILE=512 GEM_FUSE_CHUNK=512

# --- 4M LiDAR row: geometry also point-bound there -------------------------
B4='"phase":"step","fuse":"stream","feature_backend":"pallas","points":4194304,"raytrace_every":10,"color":false,"n_frames":2,"k_lo":2,"k_hi":8,"trials":3'
run_phase step_4m_default "{\"name\":\"step_4m_default\",$B4}" 3000
run_phase step_4m_t512_c512 "{\"name\":\"step_4m_t512_c512\",$B4}" 3000 GEM_FUSE_TILE=512 GEM_FUSE_CHUNK=512

# --- 128k Hz row sanity at the small-geometry cells (tile-count-bound:
#     expect a loss; measure it so the auto-pick ladder has both ends) ------
HZ='"phase":"step","fuse":"stream","feature_backend":"pallas","points":131072,"n_frames":2,"k_lo":4,"k_hi":24,"trials":3'
run_phase step_hz_t512_c512 "{\"name\":\"step_hz_t512_c512\",$HZ}" 3000 GEM_FUSE_TILE=512 GEM_FUSE_CHUNK=512

log "done"

#!/bin/bash
# Round-4 sweep B: PASSA=scan single-dot fuse kernel A/B (VERDICT #1).
#
# Round-4a closed two questions: the gather pass-A is dead on Mosaic
# (multi-vreg lane gather), and the TILE/CHUNK grid below 1024 is
# monotonically worse at 1M pts (t1024c1024 11.39 ms > t512c512 14.33 >
# t256c256 20.04) — the round-3 default geometry stands.  This sweep
# A/Bs the restructured scan kernel (ONE one-hot + ONE 15-column dot per
# chunk, prior rides the point matrix, anchor via segmented scan) against
# the measured dot baseline at the same geometry, prices its one new XLA
# op (the sorted 1M take), re-opens the geometry question upward (the
# per-chunk cost ratio changed), and confirms at the step level on the
# three north-star rows.
#
# Runs from a snapshot of the committed tree (git archive HEAD) so the
# working tree stays editable during the sweep (CLAUDE.md).  Same TPU
# lock protocol as round3.sh.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/bench/results/round4"
SNAP=/tmp/gem_r4b_tree
mkdir -p "$OUT"

rm -rf "$SNAP" && mkdir -p "$SNAP"
git -C "$REPO" archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"

T0=$(date +%s)
BUDGET="${GEM_R4_BUDGET_S:-9000}"
left() { echo $(( BUDGET - ($(date +%s) - T0) )); }
log() { echo "[round4b $(date +%H:%M:%S)] $*" | tee -a "$OUT/run.log"; }

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
     '{"name":"nop","phase":"nop"}' > "$OUT/nop_b.txt" 2>&1; then
  log "relay unhealthy (nop probe timed out) - aborting"
  exit 1
fi
grep PROBE_RESULT "$OUT/nop_b.txt" | tee -a "$OUT/run.log"

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

run_phase matmul_ctl_b '{"name":"matmul_ctl_b","phase":"matmul"}' 1200

# --- price the scan kernel's one new XLA op: the sorted 1M-point take ------
run_phase gather1m_sorted '{"name":"gather1m_sorted","phase":"gather_sorted","n":1048576,"nseg":1000000}' 1200

# --- isolated kernel A/B at the champion geometry (dot = 11.39 ms, 4a) -----
FK='"phase":"fusekernel","points":1048576,"k_lo":2,"k_hi":12,"trials":3'
run_phase fusek_1m_scan_t1024_c1024 "{\"name\":\"fusek_1m_scan_t1024_c1024\",$FK}" 3000 GEM_FUSE_PASSA=scan GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=1024
# geometry re-opens UPWARD: per-chunk cost dropped ~3x, so larger TILE
# (fewer tiles) and CHUNK (fewer loop iterations) may now win
run_phase fusek_1m_scan_t2048_c1024 "{\"name\":\"fusek_1m_scan_t2048_c1024\",$FK}" 3000 GEM_FUSE_PASSA=scan GEM_FUSE_TILE=2048 GEM_FUSE_CHUNK=1024
run_phase fusek_1m_scan_t2048_c2048 "{\"name\":\"fusek_1m_scan_t2048_c2048\",$FK}" 3000 GEM_FUSE_PASSA=scan GEM_FUSE_TILE=2048 GEM_FUSE_CHUNK=2048
run_phase fusek_1m_scan_t1024_c2048 "{\"name\":\"fusek_1m_scan_t1024_c2048\",$FK}" 3000 GEM_FUSE_PASSA=scan GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=2048
run_phase fusek_1m_scan_t4096_c2048 "{\"name\":\"fusek_1m_scan_t4096_c2048\",$FK}" 3000 GEM_FUSE_PASSA=scan GEM_FUSE_TILE=4096 GEM_FUSE_CHUNK=2048

# --- colored kernel A/B (the 15-col dot carries the color placement) -------
run_phase fusek_1m_scan_colored "{\"name\":\"fusek_1m_scan_colored\",$FK,\"colored\":true}" 3000 GEM_FUSE_PASSA=scan GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=1024
run_phase fusek_1m_dot_colored "{\"name\":\"fusek_1m_dot_colored\",$FK,\"colored\":true}" 3000 GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=1024

# --- step-level strict rows (the VERDICT #1 targets) -----------------------
ST='"phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"k_lo":2,"k_hi":12,"trials":3'
run_phase step_1m_scan "{\"name\":\"step_1m_scan\",$ST}" 3000 GEM_FUSE_PASSA=scan
SC='"phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"colored":true,"n_frames":2,"k_lo":2,"k_hi":12,"trials":3'
run_phase step_1m_scan_colored "{\"name\":\"step_1m_scan_colored\",$SC}" 3000 GEM_FUSE_PASSA=scan
B4='"phase":"step","fuse":"stream","feature_backend":"pallas","points":4194304,"raytrace_every":10,"color":false,"n_frames":2,"k_lo":2,"k_hi":8,"trials":3'
run_phase step_4m_scan "{\"name\":\"step_4m_scan\",$B4}" 3000 GEM_FUSE_PASSA=scan
HZ='"phase":"step","fuse":"stream","feature_backend":"pallas","points":131072,"n_frames":2,"k_lo":4,"k_hi":24,"trials":3'
run_phase step_hz_scan "{\"name\":\"step_hz_scan\",$HZ}" 3000 GEM_FUSE_PASSA=scan
# small-frame geometry: _pick_tile chooses 2048 at 128k; confirm scan there
run_phase step_hz_scan_t1024 "{\"name\":\"step_hz_scan_t1024\",$HZ}" 3000 GEM_FUSE_PASSA=scan GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=512

# --- best-geometry colored + 4M confirms (filled in by hand if the grid
#     above moves the champion; defaults assume t1024c1024 holds) ----------
run_phase step_1m_scan_c2048 "{\"name\":\"step_1m_scan_c2048\",$ST}" 3000 GEM_FUSE_PASSA=scan GEM_FUSE_CHUNK=2048

log "done"

#!/bin/bash
# Round-4 sweep C: the post-scan-verdict matrix.
#
# 4b verdicts: PASSA=scan is dead on this chip (the ride-along prior needs
# two sorted 1M-index XLA takes at 7.5 ms each — gather1m_sorted.txt), and
# kernel cost is dominated by ~1.2-1.5 us/chunk FIXED cost plus the sort,
# NOT by the skinny MXU dots (ABL_V51: nomm saves only 1.3 ms).  This sweep
# A/Bs the surviving levers at the 1M strict operating point:
#   * GEM_FUSE_SORTK=2   — drop the v comparator key (-1.0-1.2 ms expected)
#   * GEM_FUSE_PASSA=scanp — single fused B dot + segmented anchor scan,
#     prior via pass-A dot (gather-free)
#   * GEM_FUSE_OHT=transpose — replace the 2nd one-hot build
#   * dot-mode geometry ABOVE the round-3 grid (fewer chunks: t2048/c2048)
#   * ablations at the champion geometry (nomm / noprior)
#   * persistent-compile-cache probe: the SAME phase run twice; the probe
#     now forces jax's cache open for the axon platform (GEM_AXON_CACHE)
# then confirms at the step level.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/bench/results/round4"
SNAP=/tmp/gem_r4c_tree
mkdir -p "$OUT"

rm -rf "$SNAP" && mkdir -p "$SNAP"
git -C "$REPO" archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"

T0=$(date +%s)
BUDGET="${GEM_R4_BUDGET_S:-10800}"
left() { echo $(( BUDGET - ($(date +%s) - T0) )); }
log() { echo "[round4c $(date +%H:%M:%S)] $*" | tee -a "$OUT/run.log"; }

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
     '{"name":"nop","phase":"nop"}' > "$OUT/nop_c.txt" 2>&1; then
  log "relay unhealthy (nop probe timed out) - aborting"
  exit 1
fi
grep PROBE_RESULT "$OUT/nop_c.txt" | tee -a "$OUT/run.log"

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

ms_of() {  # extract per_program_ms from a result file (blank if absent)
  grep PROBE_RESULT "$OUT/$1.txt" 2>/dev/null | tail -1 \
    | sed -n 's/.*"per_program_ms": \([0-9.]*\).*/\1/p'
}

run_phase matmul_ctl_c '{"name":"matmul_ctl_c","phase":"matmul"}' 1200
# cache probe: identical program again — a warm persistent cache makes the
# 2nd run's wall collapse (compile skipped) with an unchanged tflops number
run_phase matmul_ctl_c2 '{"name":"matmul_ctl_c2","phase":"matmul"}' 1200

# --- kernel-level A/B matrix @ 1M pts, 1000^2 ------------------------------
FK='"phase":"fusekernel","points":1048576,"k_lo":2,"k_hi":12,"trials":3'
# comparator depth on the shipped dot kernel
run_phase fusek_1m_sortk2 "{\"name\":\"fusek_1m_sortk2\",$FK}" 3000 GEM_FUSE_SORTK=2 GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=1024
# scanp: fused single B dot + anchor scan, prior dot
run_phase fusek_1m_scanp "{\"name\":\"fusek_1m_scanp\",$FK}" 3000 GEM_FUSE_PASSA=scanp GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=1024
# scanp + 2-key
run_phase fusek_1m_scanp_k2 "{\"name\":\"fusek_1m_scanp_k2\",$FK}" 3000 GEM_FUSE_PASSA=scanp GEM_FUSE_SORTK=2 GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=1024
# scanp + transpose for the pass-A one-hot
run_phase fusek_1m_scanp_oht "{\"name\":\"fusek_1m_scanp_oht\",$FK}" 3000 GEM_FUSE_PASSA=scanp GEM_FUSE_OHT=transpose GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=1024
# dot-mode geometry ABOVE the round-3 grid (4a swept below; 4b's scan-mode
# deltas say fewer chunks win ~1.2 us each)
run_phase fusek_1m_dot_t2048_c1024 "{\"name\":\"fusek_1m_dot_t2048_c1024\",$FK}" 3000 GEM_FUSE_TILE=2048 GEM_FUSE_CHUNK=1024
run_phase fusek_1m_dot_t2048_c2048 "{\"name\":\"fusek_1m_dot_t2048_c2048\",$FK}" 3000 GEM_FUSE_TILE=2048 GEM_FUSE_CHUNK=2048
run_phase fusek_1m_dot_t4096_c2048 "{\"name\":\"fusek_1m_dot_t4096_c2048\",$FK}" 3000 GEM_FUSE_TILE=4096 GEM_FUSE_CHUNK=2048

# --- champion selection: best of the matrix vs the 11.39 baseline ----------
BASE_MS=11.40
best_name=baseline; best_ms=$BASE_MS
for n in fusek_1m_sortk2 fusek_1m_scanp fusek_1m_scanp_k2 fusek_1m_scanp_oht \
         fusek_1m_dot_t2048_c1024 fusek_1m_dot_t2048_c2048 \
         fusek_1m_dot_t4096_c2048; do
  m=$(ms_of "$n")
  [ -n "$m" ] || continue
  if python -c "import sys; sys.exit(0 if $m < $best_ms else 1)"; then
    best_ms=$m; best_name=$n
  fi
done
log "champion: $best_name ($best_ms ms)"

# env for the champion combo (geometry falls back to t1024c1024)
champ_env() {
  case "$best_name" in
    fusek_1m_sortk2) echo "GEM_FUSE_SORTK=2" ;;
    fusek_1m_scanp) echo "GEM_FUSE_PASSA=scanp" ;;
    fusek_1m_scanp_k2) echo "GEM_FUSE_PASSA=scanp GEM_FUSE_SORTK=2" ;;
    fusek_1m_scanp_oht) echo "GEM_FUSE_PASSA=scanp GEM_FUSE_OHT=transpose" ;;
    fusek_1m_dot_t2048_c1024) echo "GEM_FUSE_TILE=2048 GEM_FUSE_CHUNK=1024" ;;
    fusek_1m_dot_t2048_c2048) echo "GEM_FUSE_TILE=2048 GEM_FUSE_CHUNK=2048" ;;
    fusek_1m_dot_t4096_c2048) echo "GEM_FUSE_TILE=4096 GEM_FUSE_CHUNK=2048" ;;
    *) echo "" ;;
  esac
}
CHAMP="$(champ_env)"

# combined champion: scanp_k2 + best geometry (the knobs compose)
run_phase fusek_1m_combo "{\"name\":\"fusek_1m_combo\",$FK}" 3000 GEM_FUSE_PASSA=scanp GEM_FUSE_SORTK=2 GEM_FUSE_TILE=2048 GEM_FUSE_CHUNK=2048

# --- ablations at the champion geometry (kernel-internal composition) ------
run_phase fusek_1m_abl_nomm "{\"name\":\"fusek_1m_abl_nomm\",$FK}" 3000 GEM_FUSE_ABLATE=nomm GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=1024
run_phase fusek_1m_abl_noprior "{\"name\":\"fusek_1m_abl_noprior\",$FK}" 3000 GEM_FUSE_ABLATE=noprior GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=1024

# --- step-level confirms ---------------------------------------------------
ST='"phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"k_lo":2,"k_hi":12,"trials":3'
run_phase step_1m_champ "{\"name\":\"step_1m_champ\",$ST}" 3000 $CHAMP
run_phase step_1m_combo "{\"name\":\"step_1m_combo\",$ST}" 3000 GEM_FUSE_PASSA=scanp GEM_FUSE_SORTK=2 GEM_FUSE_TILE=2048 GEM_FUSE_CHUNK=2048
# cache probe at the step level: repeat the combo phase verbatim
run_phase step_1m_combo2 "{\"name\":\"step_1m_combo2\",$ST}" 3000 GEM_FUSE_PASSA=scanp GEM_FUSE_SORTK=2 GEM_FUSE_TILE=2048 GEM_FUSE_CHUNK=2048
SC='"phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"colored":true,"n_frames":2,"k_lo":2,"k_hi":12,"trials":3'
run_phase step_1m_combo_col "{\"name\":\"step_1m_combo_col\",$SC}" 3000 GEM_FUSE_PASSA=scanp GEM_FUSE_SORTK=2 GEM_FUSE_TILE=2048 GEM_FUSE_CHUNK=2048
B4='"phase":"step","fuse":"stream","feature_backend":"pallas","points":4194304,"raytrace_every":10,"color":false,"n_frames":2,"k_lo":2,"k_hi":8,"trials":3'
run_phase step_4m_combo "{\"name\":\"step_4m_combo\",$B4}" 3000 GEM_FUSE_PASSA=scanp GEM_FUSE_SORTK=2 GEM_FUSE_TILE=2048 GEM_FUSE_CHUNK=2048
HZ='"phase":"step","fuse":"stream","feature_backend":"pallas","points":131072,"n_frames":2,"k_lo":4,"k_hi":24,"trials":3'
run_phase step_hz_combo "{\"name\":\"step_hz_combo\",$HZ}" 3000 GEM_FUSE_PASSA=scanp GEM_FUSE_SORTK=2

log "done"

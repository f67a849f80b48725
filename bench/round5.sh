#!/bin/bash
# Round-5 sweep: land the PASSA=fact on-chip A/B (VERDICT r4 #1/#2/#7).
#
# Round 4 ended with its best lever unmeasured: the factored one-hot kernel
# (GEM_FUSE_PASSA=fact, c8753ad) removes the (CHUNK, TILE) one-hot build —
# the dot kernel's dominant VPU cost — so per-chunk cost stops scaling with
# TILE (only with TILE/16 via the W=8R expansion masks).  That un-sticks the
# TILE ladder: bigger tiles mean fewer grid steps and fewer boundary chunks,
# and bigger CHUNK directly divides the measured ~1.5 us/chunk fixed cost
# (PROFILE_r4.md geometry ladder) — the two dominant terms of the strict-1M
# row (71 M pts/s vs the >=100 M bar).
#
# Matrix (priority order; every phase in its own subprocess, round4c
# protocol: snapshot tree, lock handshake, budget gating):
#   1. health probes (nop + control matmul)
#   2. dot-kernel baseline re-run (same-session anchor)
#   3. fact TILE x CHUNK ladder @ 1M pts (6 cells)
#   4. champion pick -> DMADEPTH 2/8 A/B at champion geometry
#   5. fact cells @ 131k (Hz operating point) and 4M (big row, colorless)
#   6. on-chip fact parity accuracy (L=128, stream vs CPU segment)
#   7. step-level confirms with the champion env (1M strict, Hz, 4M, colored)
#   8. flagship-geometry accuracy: L=1000, shipped-path feature backend
#   9. compile-cache prewarm of the bench.py --full extras (refcadence, scan)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/bench/results/round5"
SNAP=/tmp/gem_r5_tree
mkdir -p "$OUT"

rm -rf "$SNAP" && mkdir -p "$SNAP"
git -C "$REPO" archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"

T0=$(date +%s)
BUDGET="${GEM_R5_BUDGET_S:-14400}"
left() { echo $(( BUDGET - ($(date +%s) - T0) )); }
log() { echo "[round5 $(date +%H:%M:%S)] $*" | tee -a "$OUT/run.log"; }

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

ms_of() {  # extract per_program_ms from a result file (blank if absent)
  grep PROBE_RESULT "$OUT/$1.txt" 2>/dev/null | tail -1 \
    | sed -n 's/.*"per_program_ms": \([0-9.]*\).*/\1/p'
}

run_phase matmul_ctl '{"name":"matmul_ctl","phase":"matmul"}' 1200

# --- kernel ladder @ 1M pts, 1000^2 ----------------------------------------
FK='"phase":"fusekernel","points":1048576,"k_lo":2,"k_hi":12,"trials":3'
# same-session baseline: the shipped dot kernel at its round-4 optimum
run_phase fusek_1m_base "{\"name\":\"fusek_1m_base\",$FK}" 3000 \
  GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=1024

# fact TILE x CHUNK ladder (chunk count at 1M: c1024 ~1954, c2048 ~990,
# c4096 ~500 — each halving removes ~1.5 us x chunks of fixed cost IF the
# variable cost stays flat, which is the fact hypothesis)
FACT_CELLS="1024:1024 2048:1024 2048:2048 4096:2048 4096:4096 8192:4096"
for cell in $FACT_CELLS; do
  t="${cell%%:*}"; c="${cell##*:}"
  run_phase "fusek_1m_fact_t${t}_c${c}" \
    "{\"name\":\"fusek_1m_fact_t${t}_c${c}\",$FK}" 3000 \
    GEM_FUSE_PASSA=fact GEM_FUSE_TILE=$t GEM_FUSE_CHUNK=$c
done

# --- champion selection ------------------------------------------------------
BASE_MS=$(ms_of fusek_1m_base); BASE_MS="${BASE_MS:-10.93}"
best_name=base; best_ms=$BASE_MS; best_t=1024; best_c=1024; best_fact=0
for cell in $FACT_CELLS; do
  t="${cell%%:*}"; c="${cell##*:}"
  m=$(ms_of "fusek_1m_fact_t${t}_c${c}")
  [ -n "$m" ] || continue
  if python -c "import sys; sys.exit(0 if $m < $best_ms else 1)"; then
    best_ms=$m; best_name="fact_t${t}_c${c}"; best_t=$t; best_c=$c
    best_fact=1
  fi
done
log "1M champion: $best_name ($best_ms ms vs base $BASE_MS)"
if [ "$best_fact" = 1 ]; then
  CHAMP="GEM_FUSE_PASSA=fact GEM_FUSE_TILE=$best_t GEM_FUSE_CHUNK=$best_c"
else
  CHAMP="GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=1024"
fi

# --- DMA ring depth at the champion geometry (default is 4) -----------------
run_phase fusek_1m_champ_d2 "{\"name\":\"fusek_1m_champ_d2\",$FK}" 3000 \
  $CHAMP GEM_FUSE_DMADEPTH=2
run_phase fusek_1m_champ_d8 "{\"name\":\"fusek_1m_champ_d8\",$FK}" 3000 \
  $CHAMP GEM_FUSE_DMADEPTH=8

# --- fact at the other operating points --------------------------------------
# Hz row (131k pts): dot auto-pick is t2048/c512; fact candidates coarser
FH='"phase":"fusekernel","points":131072,"k_lo":4,"k_hi":24,"trials":3'
run_phase fusek_hz_base "{\"name\":\"fusek_hz_base\",$FH}" 2400 \
  GEM_FUSE_TILE=2048 GEM_FUSE_CHUNK=512
run_phase fusek_hz_fact_t2048_c512 \
  "{\"name\":\"fusek_hz_fact_t2048_c512\",$FH}" 2400 \
  GEM_FUSE_PASSA=fact GEM_FUSE_TILE=2048 GEM_FUSE_CHUNK=512
run_phase fusek_hz_fact_t4096_c512 \
  "{\"name\":\"fusek_hz_fact_t4096_c512\",$FH}" 2400 \
  GEM_FUSE_PASSA=fact GEM_FUSE_TILE=4096 GEM_FUSE_CHUNK=512
run_phase fusek_hz_fact_t4096_c1024 \
  "{\"name\":\"fusek_hz_fact_t4096_c1024\",$FH}" 2400 \
  GEM_FUSE_PASSA=fact GEM_FUSE_TILE=4096 GEM_FUSE_CHUNK=1024

# 4M big row (colorless): dot auto-pick is t1024/c1024
F4='"phase":"fusekernel","points":4194304,"color":false,"k_lo":2,"k_hi":8,"trials":3'
run_phase fusek_4m_fact_champ "{\"name\":\"fusek_4m_fact_champ\",$F4}" 3000 \
  GEM_FUSE_PASSA=fact GEM_FUSE_TILE=$best_t GEM_FUSE_CHUNK=$best_c
run_phase fusek_4m_fact_t2048_c4096 \
  "{\"name\":\"fusek_4m_fact_t2048_c4096\",$F4}" 3000 \
  GEM_FUSE_PASSA=fact GEM_FUSE_TILE=2048 GEM_FUSE_CHUNK=4096

# --- on-chip fact parity accuracy (VERDICT r4 #7) ----------------------------
# stream(fact) on the chip vs the CPU segment oracle, default geometry
acc() {  # name timeout args... (env via ACC_ENV)
  local name="$1" to="$2"; shift 2
  local l; l=$(left)
  if [ "$l" -lt 300 ]; then log "SKIP $name (budget exhausted)"; return 1; fi
  [ "$to" -gt "$l" ] && to=$l
  log "accuracy $name timeout=${to}s left=${l}s env=${ACC_ENV:-}"
  run_tpu env ${ACC_ENV:-} timeout "$to" python bench/accuracy.py \
    --out "$OUT/$name.json" "$@" > "$OUT/$name.txt" 2>&1
  tail -2 "$OUT/$name.txt" | tee -a "$OUT/run.log"
}
ACC_ENV="GEM_FUSE_PASSA=fact" acc acc_fact_l128 2400 --backends stream

# --- step-level confirms with the champion env -------------------------------
ST='"phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"k_lo":2,"k_hi":12,"trials":3'
run_phase step_1m_champ "{\"name\":\"step_1m_champ\",$ST}" 3000 $CHAMP
HZ='"phase":"step","fuse":"stream","feature_backend":"pallas","points":131072,"n_frames":2,"k_lo":4,"k_hi":24,"trials":3'
if [ "$best_fact" = 1 ]; then
  run_phase step_hz_champ "{\"name\":\"step_hz_champ\",$HZ}" 3000 \
    GEM_FUSE_PASSA=fact
fi
B4='"phase":"step","fuse":"stream","feature_backend":"pallas","points":4194304,"raytrace_every":10,"color":false,"n_frames":2,"k_lo":2,"k_hi":8,"trials":3'
if [ "$best_fact" = 1 ]; then
  run_phase step_4m_champ "{\"name\":\"step_4m_champ\",$B4}" 3000 \
    GEM_FUSE_PASSA=fact
fi
SC='"phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"colored":1,"n_frames":2,"k_lo":2,"k_hi":12,"trials":3'
run_phase step_1m_col_champ "{\"name\":\"step_1m_col_champ\",$SC}" 3000 $CHAMP

# --- flagship-geometry accuracy (VERDICT r4 #4): L=1000, shipped path --------
# far-pool p=3 + TILE auto-pick active; pallas features (they gate raytrace
# deletions); fewer frames to fit the relay budget
ACC_ENV="$(echo "$CHAMP" | tr ' ' '\n' | grep GEM_FUSE_PASSA || true)"
ACC_ENV="$ACC_ENV" acc acc_l1000 3600 --length 1000 --frames 12 \
  --points 131072 --feature-backend pallas --backends stream

# --- compile-cache prewarm for the final bench.py --full capture -------------
RC='"phase":"step","fuse":"stream","feature_backend":"pallas","points":131072,"raytrace_every":10,"n_frames":2,"k_lo":4,"k_hi":8,"trials":2'
if [ "$best_fact" = 1 ]; then
  run_phase prewarm_refc "{\"name\":\"prewarm_refc\",$RC}" 2400 \
    GEM_FUSE_PASSA=fact
  SCAN='"phase":"scan","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":8'
  run_phase prewarm_scan "{\"name\":\"prewarm_scan\",$SCAN}" 2400 \
    GEM_FUSE_PASSA=fact
fi

log "done (champion: $best_name $best_ms ms)"

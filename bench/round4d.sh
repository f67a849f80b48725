#!/bin/bash
# Round-4 sweep D: champion confirms + step composition + cache debug.
#
# 4c verdicts: scan/scanp/OHT all dead; SORTK=2 on the dot kernel is the
# one kernel win (10.93 vs 11.39 ms isolated fusek @1M); geometry above
# t1024c1024 loses (the O(N*TILE) one-hot build term beats the chunk-count
# saving).  The strict-1M step is now ~11 ms fusek + ~5.7 ms "other" —
# this sweep measures the OTHER side by full-step ablation differences
# (per CLAUDE.md, isolated kernels mislead for XLA-glue phases), A/Bs the
# new DMA ring depth, and debugs why forced axon cache writes still don't
# land (JAX_LOGGING_LEVEL grep).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/bench/results/round4"
SNAP=/tmp/gem_r4d_tree
mkdir -p "$OUT"

rm -rf "$SNAP" && mkdir -p "$SNAP"
git -C "$REPO" archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"

T0=$(date +%s)
BUDGET="${GEM_R4_BUDGET_S:-10800}"
left() { echo $(( BUDGET - ($(date +%s) - T0) )); }
log() { echo "[round4d $(date +%H:%M:%S)] $*" | tee -a "$OUT/run.log"; }

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
     '{"name":"nop","phase":"nop"}' > "$OUT/nop_d.txt" 2>&1; then
  log "relay unhealthy (nop probe timed out) - aborting"
  exit 1
fi
grep PROBE_RESULT "$OUT/nop_d.txt" | tee -a "$OUT/run.log"

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

# --- cache debug: why do forced axon cache writes not land? ---------------
log "cache debug (DEBUG logging, grep cache lines)"
run_tpu env JAX_COMPILATION_CACHE_DIR=/tmp/gem_tpu_jax_cache \
    JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1 \
    JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0 \
    JAX_LOGGING_LEVEL=DEBUG \
    timeout 900 python - > "$OUT/cache_debug_raw.txt" 2>&1 <<'EOF'
import os, time
import jax
import jax._src.compilation_cache as cc
with cc._cache_initialized_mutex:
    cc._cache_checked = True
    cc._cache_used = True
import jax.numpy as jnp
import numpy as np
x = jnp.ones((4096, 4096), jnp.bfloat16)
f = jax.jit(lambda a: a @ a)
t0 = time.time()
v = float(np.asarray(f(x))[0, 0])
print("CACHEDBG compile+run1", round(time.time() - t0, 2), "val", v)
print("CACHEDBG dir:", sorted(os.listdir("/tmp/gem_tpu_jax_cache")))
print("CACHEDBG backend:", jax.devices()[0].platform,
      getattr(jax.devices()[0].client, "runtime_type", "?"),
      "ser:", getattr(jax.devices()[0].client,
                      "supports_executable_serialization", "?"))
EOF
grep -i "cache\|serializ\|CACHEDBG" "$OUT/cache_debug_raw.txt" \
  | grep -v "get_cache_key\|clearing\|debug_inf" | head -40 \
  > "$OUT/cache_debug.txt"
tail -5 "$OUT/cache_debug.txt" | tee -a "$OUT/run.log"

# --- the missed geometry cell: CHUNK up at TILE=1024 ----------------------
# pts/tile ~1170 < 2048 => ONE chunk per tile: slots (=build work) stay
# 2.0M while the chunk count halves (1954 -> 977); the ~1.2-1.5 us/chunk
# fixed term predicts ~-1.2 ms.  4c only swept TILE up (loses to the
# O(N*TILE) build term).
FK='"phase":"fusekernel","points":1048576,"k_lo":2,"k_hi":12,"trials":3'
run_phase fusek_1m_k2_c2048 "{\"name\":\"fusek_1m_k2_c2048\",$FK}" 3000 GEM_FUSE_SORTK=2 GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=2048

# --- DMA ring depth A/B at the champion -----------------------------------
run_phase fusek_1m_k2_d4 "{\"name\":\"fusek_1m_k2_d4\",$FK}" 3000 GEM_FUSE_SORTK=2 GEM_FUSE_DMADEPTH=4 GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=1024
run_phase fusek_1m_k2_c2048_d4 "{\"name\":\"fusek_1m_k2_c2048_d4\",$FK}" 3000 GEM_FUSE_SORTK=2 GEM_FUSE_DMADEPTH=4 GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=2048
run_phase fusek_1m_k2_d8 "{\"name\":\"fusek_1m_k2_d8\",$FK}" 3000 GEM_FUSE_SORTK=2 GEM_FUSE_DMADEPTH=8 GEM_FUSE_TILE=1024 GEM_FUSE_CHUNK=1024

# --- step composition by ablation differences (all SORTK=2) ---------------
ST='"phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"k_lo":2,"k_hi":12,"trials":3'
run_phase step_1m_k2 "{\"name\":\"step_1m_k2\",$ST}" 3000 GEM_FUSE_SORTK=2 GEM_FUSE_CHUNK=2048
run_phase step_1m_k2_c1024 "{\"name\":\"step_1m_k2_c1024\",$ST}" 3000 GEM_FUSE_SORTK=2
run_phase step_1m_k2_noray "{\"name\":\"step_1m_k2_noray\",$ST,\"raytrace\":false}" 3000 GEM_FUSE_SORTK=2 GEM_FUSE_CHUNK=2048
run_phase step_1m_k2_nofeat "{\"name\":\"step_1m_k2_nofeat\",$ST,\"features\":false}" 3000 GEM_FUSE_SORTK=2 GEM_FUSE_CHUNK=2048
run_phase step_1m_k2_nosub "{\"name\":\"step_1m_k2_nosub\",$ST,\"submaps\":false}" 3000 GEM_FUSE_SORTK=2 GEM_FUSE_CHUNK=2048
run_phase step_1m_k2_nolow "{\"name\":\"step_1m_k2_nolow\",$ST,\"lowest\":false}" 3000 GEM_FUSE_SORTK=2 GEM_FUSE_CHUNK=2048
run_phase step_1m_k2_fuseonly "{\"name\":\"step_1m_k2_fuseonly\",$ST,\"raytrace\":false,\"features\":false,\"submaps\":false,\"lowest\":false}" 3000 GEM_FUSE_SORTK=2 GEM_FUSE_CHUNK=2048

# --- champion step rows ----------------------------------------------------
SC='"phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"colored":true,"n_frames":2,"k_lo":2,"k_hi":12,"trials":3'
run_phase step_1m_k2_colored "{\"name\":\"step_1m_k2_colored\",$SC}" 3000 GEM_FUSE_SORTK=2 GEM_FUSE_CHUNK=2048
B4='"phase":"step","fuse":"stream","feature_backend":"pallas","points":4194304,"raytrace_every":10,"color":false,"n_frames":2,"k_lo":2,"k_hi":8,"trials":3'
run_phase step_4m_k2 "{\"name\":\"step_4m_k2\",$B4}" 3000 GEM_FUSE_SORTK=2 GEM_FUSE_CHUNK=2048
HZ='"phase":"step","fuse":"stream","feature_backend":"pallas","points":131072,"n_frames":2,"k_lo":4,"k_hi":24,"trials":3'
run_phase step_hz_k2 "{\"name\":\"step_hz_k2\",$HZ}" 3000 GEM_FUSE_SORTK=2

# --- accuracy at the champion config (stream backend, SORTK=2) ------------
l=$(left)
if [ "$l" -gt 900 ]; then
  log "accuracy (SORTK=2 stream)"
  run_tpu env GEM_FUSE_SORTK=2 timeout 900 python bench/accuracy.py \
    --backends stream > "$OUT/accuracy_k2.txt" 2>&1
  cp "$SNAP/BENCH_ACCURACY.json" "$OUT/BENCH_ACCURACY_k2.json" 2>/dev/null
  grep rmse "$OUT/accuracy_k2.txt" | head -3 | tee -a "$OUT/run.log"
fi

log "done"

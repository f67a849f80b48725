#!/bin/bash
# Round-3 on-chip measurement sequence.  Run ONLY when the relay is healthy
# (scripts check first).  One TPU process at a time (CLAUDE.md), generous
# per-phase timeouts, everything logged under bench/results/round3/.
#
# Phases run in PRIORITY order under an overall wall budget
# (GEM_R3_BUDGET_S, default 4 h): if the relay comes back late, the
# decision-critical rows (far_pool sweep for the Hz target, 1M-row fuse
# A/Bs, the headline harness, on-chip accuracy) land first and the
# diagnostics are skipped instead of overrunning into the driver's own
# end-of-round bench.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$REPO/bench/results/round3"
mkdir -p "$OUT"
cd "$REPO"

T0=$(date +%s)
BUDGET="${GEM_R3_BUDGET_S:-14400}"
left() { echo $(( BUDGET - ($(date +%s) - T0) )); }

log() { echo "[round3 $(date +%H:%M:%S)] $*" | tee -a "$OUT/run.log"; }

# TPU lock: the driver's end-of-round `bench.py` preempts this run via
# SIGTERM to the PID in this file (two TPU-attached processes poison each
# other's timings, CLAUDE.md).  Every chip-touching child runs under
# `setsid` in its OWN process group + `wait`, so the TERM trap can kill
# the whole tree (kernels.py/accuracy.py spawn probe workers that a
# plain child-kill would orphan, leaving a chip-attached process running
# into the driver's capture), REAP it, and only then drop the lock.
LOCK=/tmp/gem_round3.pid
echo $$ > "$LOCK"
export GEM_ROUND3_SELF=1   # our own bench.py phases must not preempt us
CHILD=
kill_tree() {
  [ -n "$CHILD" ] || return 0
  kill -TERM -- "-$CHILD" 2>/dev/null    # whole group (workers included)
  wait "$CHILD" 2>/dev/null              # reap before releasing the lock
  kill -KILL -- "-$CHILD" 2>/dev/null    # stragglers (hung relay calls)
  CHILD=
}
cleanup() { kill_tree; rm -f "$LOCK"; }
trap 'log "preempted (SIGTERM — yielding the TPU)"; cleanup; exit 143' TERM INT
trap cleanup EXIT

run_tpu() {  # run a chip-touching command preemptibly, in its own pgroup
  setsid "$@" &
  CHILD=$!
  wait "$CHILD"
  local rc=$?
  CHILD=
  return $rc
}

# 0. relay health: a trivial program with a value fetch must finish fast
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

# 1. control matmul (health verdict for every number below)
run_phase matmul_ctl '{"name":"matmul_ctl","phase":"matmul"}' 1200

# 2. full-step strict rows (the north-star gaps).
# 2a. Hz row @ 1000^2/128k pts with the far_pool sweep (raytrace-bound:
#     sorts shrink p^2; p=3/4 accuracy bounded by test_raytrace deep test)
run_phase step_hz_p2 '{"name":"step_hz_p2","phase":"step","fuse":"stream","feature_backend":"pallas","points":131072,"n_frames":2,"k_lo":4,"k_hi":24,"trials":3}' 3000
run_phase step_hz_p3 '{"name":"step_hz_p3","phase":"step","fuse":"stream","feature_backend":"pallas","points":131072,"n_frames":2,"far_pool":3,"k_lo":4,"k_hi":24,"trials":3}' 3000
run_phase step_hz_p4 '{"name":"step_hz_p4","phase":"step","fuse":"stream","feature_backend":"pallas","points":131072,"n_frames":2,"far_pool":4,"k_lo":4,"k_hi":24,"trials":3}' 3000
run_phase step_hz_p1 '{"name":"step_hz_p1","phase":"step","fuse":"stream","feature_backend":"pallas","points":131072,"n_frames":2,"far_pool":1,"k_lo":4,"k_hi":24,"trials":3}' 3000
# 2b. 1M camera-on strict row + fuse-kernel A/Bs (gather pass-A, CHUNK)
run_phase step_1m_p2 '{"name":"step_1m_p2","phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"k_lo":2,"k_hi":12,"trials":3}' 3000
run_phase step_1m_passa_gather '{"name":"step_1m_passa_gather","phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"k_lo":2,"k_hi":12,"trials":3}' 3000 GEM_FUSE_PASSA=gather
run_phase step_hz_passa_gather '{"name":"step_hz_passa_gather","phase":"step","fuse":"stream","feature_backend":"pallas","points":131072,"n_frames":2,"k_lo":4,"k_hi":24,"trials":3}' 3000 GEM_FUSE_PASSA=gather
run_phase step_1m_chunk1024 '{"name":"step_1m_chunk1024","phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"k_lo":2,"k_hi":12,"trials":3}' 3000 GEM_FUSE_CHUNK=1024
# 2c. color argmin A/B on GENUINELY COLORED frames ("colored":1 fills
#     valid lanes with nonzero rgb — synthetic frames are otherwise
#     colorless, so the kernels' colorless-chunk skips fire everywhere and
#     a sweep-vs-scan A/B would compare two no-ops).  The scan removes the
#     sweep's N*TILE VPU term — the dominant kernel cost for real camera
#     streams (KITTI colorized replay).
run_phase step_1m_colored '{"name":"step_1m_colored","phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"colored":1,"k_lo":2,"k_hi":12,"trials":3}' 3000
run_phase step_1m_color_scan '{"name":"step_1m_color_scan","phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"colored":1,"k_lo":2,"k_hi":12,"trials":3}' 3000 GEM_FUSE_COLOR=scan
run_phase step_hz_colored '{"name":"step_hz_colored","phase":"step","fuse":"stream","feature_backend":"pallas","points":131072,"n_frames":2,"colored":1,"k_lo":4,"k_hi":24,"trials":3}' 3000
run_phase step_hz_color_scan '{"name":"step_hz_color_scan","phase":"step","fuse":"stream","feature_backend":"pallas","points":131072,"n_frames":2,"colored":1,"k_lo":4,"k_hi":24,"trials":3}' 3000 GEM_FUSE_COLOR=scan
run_phase step_1m_scan_gather '{"name":"step_1m_scan_gather","phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"colored":1,"k_lo":2,"k_hi":12,"trials":3}' 3000 GEM_FUSE_COLOR=scan GEM_FUSE_PASSA=gather
# scan cost on colorless frames (it drops the per-chunk skip — must not
# regress the LiDAR-only rows if it becomes the default)
run_phase step_1m_scan_nocolor '{"name":"step_1m_scan_nocolor","phase":"step","fuse":"stream","feature_backend":"pallas","points":1048576,"n_frames":2,"k_lo":2,"k_hi":12,"trials":3}' 3000 GEM_FUSE_COLOR=scan

# 3. headline harness (writes BENCH_DETAIL.json; cache now warm)
if [ "$(left)" -gt 300 ]; then
  log "bench.py --full"
  GEM_BENCH_BUDGET_S=$(( $(left) > 2400 ? 2400 : $(left) )) \
    run_tpu timeout $(( $(left) > 2500 ? 2500 : $(left) )) python bench.py \
    --full > "$OUT/bench_full.json" 2> "$OUT/bench_full.err"
  tail -1 "$OUT/bench_full.json" | tee -a "$OUT/run.log"
fi

# 4. accuracy on the production backend, on-chip
if [ "$(left)" -gt 600 ]; then
  log "accuracy (stream + segment on-chip)"
  run_tpu timeout $(( $(left) > 3600 ? 3600 : $(left) )) \
    python bench/accuracy.py --backends stream,segment \
    > "$OUT/accuracy.txt" 2>&1
  tail -20 "$OUT/accuracy.txt" | tee -a "$OUT/run.log"
fi

# 5. backend shoot-out -> FUSE_CALIBRATION regen (same run as BENCH_KERNELS)
if [ "$(left)" -gt 600 ]; then
  log "kernels.py shoot-out"
  run_tpu timeout $(( $(left) > 7200 ? 7200 : $(left) )) \
    python bench/kernels.py --backends stream,segment --no-ablate \
    > "$OUT/kernels.txt" 2>&1
  tail -5 "$OUT/kernels.txt" | tee -a "$OUT/run.log"
fi

# 6. diagnostics: raytrace-only pool ladder, isolated fuse kernel, TILE A/B
run_phase ray_pool2 '{"name":"ray_pool2","phase":"raytrace","far_pool":2}' 2400
run_phase ray_pool1 '{"name":"ray_pool1","phase":"raytrace","far_pool":1}' 2400
run_phase ray_pool3 '{"name":"ray_pool3","phase":"raytrace","far_pool":3}' 2400
run_phase ray_pool4 '{"name":"ray_pool4","phase":"raytrace","far_pool":4}' 2400
run_phase fusek_1m '{"name":"fusek_1m","phase":"fusekernel","points":1048576,"k_lo":2,"k_hi":12,"trials":3}' 3000
run_phase fusek_1m_gather '{"name":"fusek_1m_gather","phase":"fusekernel","points":1048576,"k_lo":2,"k_hi":12,"trials":3}' 3000 GEM_FUSE_PASSA=gather
run_phase step_hz_tile2048 '{"name":"step_hz_tile2048","phase":"step","fuse":"stream","feature_backend":"pallas","points":131072,"n_frames":2,"k_lo":4,"k_hi":24,"trials":3}' 3000 GEM_FUSE_TILE=2048

# 6b. device trace of the strict step for the round-3 op breakdown
if [ "$(left)" -gt 600 ]; then
  log "profiler trace (strict step, benchmark preset)"
  run_tpu timeout $(( $(left) > 2400 ? 2400 : $(left) )) \
    python -m gem_tpu run --preset benchmark --frames 10 \
    --max-points 1048576 --profile "$OUT/trace" \
    > "$OUT/trace_run.txt" 2>&1 && log "trace captured"
fi

# 7. driver-artifact rehearsal: exactly what the driver runs.  Budget-
# gated like every other section — overrunning the wall budget here is
# the exact collide-with-the-driver's-own-bench mode the budget prevents.
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

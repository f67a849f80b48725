#!/bin/sh
# Round-5c: decompose the strict-1M step's residual "glue" term
# (PROFILE_r5 floor table: 1.94 ms = move + motion + metrics + XLA glue)
# by full-step ablation differences using GEM_STEP_ABLATE (timing-only
# knobs in mapping/pipeline.py).  One probe worker per program/process.
set -u
cd "$(dirname "$0")/.."
OUT=bench/results/round5c
mkdir -p "$OUT"
SPEC_BASE='{"phase": "step", "fuse": "stream", "feature_backend": "pallas", "length": 1000, "n_frames": 2, "points": 1048576, "k_lo": 2, "k_hi": 12, "trials": 3'
run() {
  name=$1; env_val=$2
  echo "=== $name (GEM_STEP_ABLATE=$env_val)" >> "$OUT/run.log"
  GEM_STEP_ABLATE="$env_val" timeout 1500 python bench/probe.py worker \
    "$SPEC_BASE, \"name\": \"$name\"}" > "$OUT/$name.json" 2>> "$OUT/run.log"
  tail -c 400 "$OUT/$name.json" >> "$OUT/run.log"; echo >> "$OUT/run.log"
}
timeout 600 python bench/probe.py worker '{"phase": "matmul", "name": "ctl"}' \
  > "$OUT/ctl.json" 2>> "$OUT/run.log"
cat "$OUT/ctl.json" >> "$OUT/run.log"; echo >> "$OUT/run.log"
run step1m_base ""
run step1m_nomove "nomove"
run step1m_nomotion "nomotion"
run step1m_nometrics "nometrics"
run step1m_noglue "nomove,nomotion,nometrics"
echo DONE >> "$OUT/run.log"

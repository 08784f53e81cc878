#!/bin/bash
# One-shot TPU re-verification after tunnel downtime: runs the perf
# surfaces in sequence and logs everything.  Expected anchors
# (docs/PERFORMANCE.md, round 5): bench.py ~774 ref/s bf16 batch 64
# (culling, 100-round loop); serve_bench ~745 ref/s bf16; bench_train
# ~154 ms/step fp32 (~127 bf16).
#
#   bash tools/tpu_reverify.sh [LOGDIR]
#
# Each step tolerates failure so a broken stage doesn't mask the rest.
set -u
LOGDIR=${1:-/tmp/tpu_reverify_$(date +%H%M)}
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."
echo "logs -> $LOGDIR"

run() {
    name=$1; shift
    echo "=== $name: $* ==="
    timeout 2400 "$@" > "$LOGDIR/$name.log" 2>&1
    rc=$?
    tail -3 "$LOGDIR/$name.log"
    echo "=== $name rc=$rc ==="
}

run bench        python bench.py
run serve_bench  python tools/serve_bench.py
run bench_train  python tools/bench_train.py
PROFILE_BATCH=64 PROFILE_FULL=1 run profile64 python tools/profile_components.py

echo "done; compare against docs/PERFORMANCE.md anchors"

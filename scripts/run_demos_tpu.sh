#!/bin/bash
# Run every shipped XML demo on the real TPU, sequentially (the axon tunnel
# allows ONE TPU process at a time).  Usage: bash scripts/run_demos_tpu.sh
# Logs to /tmp/demo_sweep/<name>.log; prints a PASS/FAIL table.
set -u
cd "$(dirname "$0")/.."
ROOT=$(pwd)
export PYTHONPATH="$ROOT${PYTHONPATH:+:$PYTHONPATH}"
OUT=/tmp/demo_sweep
mkdir -p "$OUT"
pass=0; fail=0
for proj in $(find demo -name project.xml | grep -v '/empty/' | sort); do
    d=$(dirname "$proj")
    name=$(echo "$d" | tr / _)
    start=$(date +%s)
    (cd "$d" && timeout "${DEMO_TIMEOUT:-900}" python -m fibergen_tpu.cli project.xml) \
        > "$OUT/$name.log" 2>&1
    rc=$?
    end=$(date +%s)
    if [ $rc -eq 0 ]; then
        pass=$((pass+1)); status=PASS
    else
        fail=$((fail+1)); status="FAIL(rc=$rc)"
    fi
    echo "$status $name $((end-start))s"
done
echo "demo sweep: $pass passed, $fail failed"
[ $fail -eq 0 ]

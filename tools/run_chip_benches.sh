#!/bin/bash
# Serialized on-chip measurement sweep (ONE process owns the tunneled TPU
# at a time — see .claude/skills/verify/SKILL.md). Each stage logs to
# /tmp/chipbench/<name>.log; a stage failing or timing out does not stop
# the sweep. Run: bash tools/run_chip_benches.sh [stage ...]
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/chipbench
STAGES="$*"

want() { [ -z "$STAGES" ] || [[ " $STAGES " == *" $1 "* ]]; }

run() {
  name="$1"; tmo="$2"; shift 2
  want "$name" || return 0
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" >"/tmp/chipbench/$name.log" 2>&1
  echo "=== $name exit $? $(date +%H:%M:%S) (tail) ==="
  tail -5 "/tmp/chipbench/$name.log"
}

run tpu_checks 1800 python tools/tpu_checks.py
run headline 1800 python bench.py --model llava-1.5-7b-int8 --batch 16 --kv-int8 --loaded-ttft
run spec 1800 python tools/bench_spec.py
run pack 1800 python tools/bench_pack.py
run eval 1800 python tools/bench_eval.py
run prefix 1800 python tools/bench_prefix.py
run paged 1800 python tools/bench_paged.py --stage paged-4096
echo "=== sweep done $(date +%H:%M:%S) ==="

#!/bin/bash
# Round-3 chip pipeline: fusion A/Bs + secondary metrics + cache re-warm.
# Each bench.py invocation is tunnel-resilient (bounded probe/retry inside
# bench.py); this script just sequences configs and records JSON results.
# Results land in /root/repo/.ab/<name>.json (stdout) and .err (stderr).
set -u
cd /root/repo
mkdir -p .ab
export UCE_BENCH_DEADLINE_S=${UCE_BENCH_DEADLINE_S:-10000}

run() {
  local name="$1"; shift
  if [ -s ".ab/${name}.json" ] && grep -q '"value": [0-9]' ".ab/${name}.json"; then
    echo "skip ${name} (already measured)"; return
  fi
  echo "=== ${name} start $(date -u +%H:%M:%S) ==="
  echo "MEASURING" > .ab/ACTIVE
  "$@" python bench.py --skip_edit > ".ab/${name}.json" 2> ".ab/${name}.err"
  rm -f .ab/ACTIVE
  echo "=== ${name} done $(date -u +%H:%M:%S): $(cat .ab/${name}.json) ==="
}

# A/B matrix for the two pending fusion candidates (docs/PERF.md).
run baseline        env
run gn_reduce       env UCE_GN_STATS=reduce
run conv_pallas     env UCE_CONV_IMPL=pallas
run gn_conv         env UCE_GN_STATS=reduce UCE_CONV_IMPL=pallas

# Secondary metrics for the bench artifact (VERDICT item 5).
# Same skip guard as run(): a terminal-failure record ({"value": null,
# "error": ...}) must NOT suppress the retry on the next invocation.
if ! grep -q '"value": [0-9]' .ab/flux_w8.json 2>/dev/null; then
  echo "=== flux_w8 start $(date -u +%H:%M:%S) ==="
  echo "MEASURING" > .ab/ACTIVE
  env UCE_BENCH_DEADLINE_S=10000 python bench.py --skip_edit --flux --flux_w8 \
    > .ab/flux_w8.json 2> .ab/flux_w8.err
  rc=$?
  rm -f .ab/ACTIVE
  echo "=== flux_w8 done: rc=${rc} ==="
fi
echo "ALL DONE $(date -u +%H:%M:%S)"

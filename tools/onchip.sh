#!/bin/bash
# On-chip measurement checklist (run when the TPU chip is reachable).
#
# Each stage logs to /tmp/onchip/<stage>.log and is individually skippable:
#   tools/onchip.sh            # run everything in order
#   tools/onchip.sh bench roofline   # run a subset
#
# Stages in PRIORITY order (the chip window may be short; the driver's
# end-of-round bench is the round's key deliverable, so seed it first):
#   bench    - bench.py twice: first with a generous budget (which also
#              measures the hazard stages — bf16 ingest + functionals —
#              that tight budgets quarantine; see bench.py docstring),
#              then with the default budget to validate the exact driver
#              scenario.  The driver scenario no longer needs a seeded
#              cache: a fully cold default-budget run fits every
#              non-hazard extra (measured 2026-08-20).
#   roofline - benchmarks/roofline.py --batches 64 128 (bytes-vs-FLOPs
#              accounting + batch/remat probes; both MEASURED 2026-08-19,
#              results in benchmarks/roofline_onchip.jsonl and
#              ARCHITECTURE.md §2b′ — remat rejected, batch knee at 128.
#              Re-run only to refresh the artifact)
#   serving  - benchmarks/serving_bench.py against the chip (replaces the
#              CPU-backend JSON; VERDICT r2 item 2)
#   smoke    - tests_tpu/ hardware lane (Pallas/Mosaic kernels, parity)
#   demo     - benchmarks/privacy_demo.py --mode both (~100 min/mode; both
#              full-scale curves MEASURED on-chip 2026-08-19 and committed
#              — re-run only to refresh the artifact.  Resumable: a killed
#              run restarted with the same mode/preset skips completed
#              trainings under /tmp/privacy_demo/)
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/onchip
STAGES=${@:-"bench roofline serving smoke demo"}

run() { # name, command...
  local name=$1; shift
  echo "=== $name: $* (log /tmp/onchip/$name.log) ==="
  local t0=$SECONDS
  "$@" >"/tmp/onchip/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc elapsed=$((SECONDS - t0))s ($(date -u +%H:%M:%S)) ==="
  tail -3 "/tmp/onchip/$name.log"
}

for s in $STAGES; do
  case $s in
    smoke)    run smoke python -m pytest tests_tpu/ -q ;;
    bench)    run bench1 env SEPT_BENCH_BUDGET_S=2400 timeout 2700 python bench.py
              run bench2 timeout 600 python bench.py ;;
    roofline) run roofline timeout 3600 python benchmarks/roofline.py --batches 64 128 ;;
    serving)  run serving timeout 1200 python benchmarks/serving_bench.py ;;
    demo)     run demo timeout 18000 python benchmarks/privacy_demo.py --mode both ;;
    *) echo "unknown stage: $s" ;;
  esac
done

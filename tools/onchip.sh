#!/bin/bash
# On-chip measurement checklist (run when the TPU chip is reachable).
#
# Each stage logs to /tmp/onchip/<stage>.log and is individually skippable:
#   tools/onchip.sh            # run everything in order
#   tools/onchip.sh bench roofline   # run a subset
#
# Stages (cheap -> expensive; ~10 min through `serving`, then the demo):
#   smoke    - tests_tpu/ hardware lane (Pallas/Mosaic kernels, parity)
#   bench    - bench.py twice (validates budget logic, seeds .jax_cache/
#              for the driver's end-of-round run)
#   roofline - benchmarks/roofline.py --batches 64 128 (bytes-vs-FLOPs
#              accounting + the batch headroom probe; feeds ARCHITECTURE.md)
#   serving  - benchmarks/serving_bench.py against the chip (replaces the
#              CPU-backend JSON; VERDICT r2 item 2)
#   demo     - benchmarks/privacy_demo.py --mode reference (~100 min; the
#              reference-faithful privacy curve, VERDICT r2 item 3)
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/onchip
STAGES=${@:-"smoke bench roofline serving demo"}

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
    bench)    run bench1 timeout 600 python bench.py
              run bench2 timeout 600 python bench.py ;;
    roofline) run roofline timeout 1800 python benchmarks/roofline.py --batches 64 128 ;;
    serving)  run serving timeout 1200 python benchmarks/serving_bench.py ;;
    demo)     run demo timeout 9000 python benchmarks/privacy_demo.py --mode reference ;;
    *) echo "unknown stage: $s" ;;
  esac
done

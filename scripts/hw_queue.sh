#!/bin/bash
# Hardware validation queue: wait for the TPU tunnel, then run every
# hardware-only check/A-B in sequence, logging to $FDREADOUT_HW_LOG
# (default /tmp/hw_queue.log).  Each item is individually time-bounded so
# a mid-run tunnel wedge costs one item, not the queue.
#
# This is the round's standing recipe (see .claude/skills/verify):
#   1. int16 op-matrix re-probe (cheap; reopens the i16 lever only if the
#      libtpu generation changed — CLAUDE.md "Native int16 compute").
#   2. Compiled-Mosaic parity for the two-pass FIR schedules.
#   3. Interleaved FIR schedule A/B (fused vs twopass=1/2, blocked+whole).
#   4. ProtoWIB time2-feed hardware parity.
#   5. Sharded-Pallas (shard_map + Mosaic) compiled parity on a 1-device
#      TPU mesh.
#   6. bench.py (slope-timed headline; gates itself on tunnel health).
#
# Usage: nohup scripts/hw_queue.sh & — then watch the log.
set -u
cd "$(dirname "$0")/.."
log="${FDREADOUT_HW_LOG:-/tmp/hw_queue.log}"
run() {  # run <seconds> <label> <cmd...>
  local t=$1 label=$2; shift 2
  echo "=== $label $(date -u +%H:%M:%S)" >> "$log"
  timeout "$t" "$@" >> "$log" 2>&1
  echo "--- $label exit=$? $(date -u +%H:%M:%S)" >> "$log"
}

echo "=== hw_queue start $(date -u +%H:%M:%S)" >> "$log"
if ! python scripts/wait_tpu.py --budget "${FDREADOUT_HW_WAIT_S:-14400}" \
    >> "$log" 2>&1; then
  echo "=== hw_queue: tunnel never recovered; aborting" >> "$log"
  exit 1
fi

run 900  "i16 op-matrix re-probe"  python scripts/probe_i16_ops.py
run 1200 "FIR twopass compiled parity" python scripts/check_fir_twopass_hw.py
run 3600 "FIR schedule A/B" python scripts/bench_ab.py --alg FIR --trials 5 \
  --config "sub=8,twopass=0" --config "sub=8,twopass=1" \
  --config "sub=8,twopass=2" --config "sub=0,tc=256,twopass=1" \
  --config "sub=0,tc=256,twopass=2"
run 1800 "ProtoWIB time2 hw parity" python scripts/check_protowib_time2_hw.py
run 1800 "sharded Pallas hw parity" python scripts/check_sharded_pallas_hw.py
run 5400 "autotune quick+confirm" python scripts/autotune.py --quick \
  --confirm 3 --out /tmp/tuned_hwq.json
run 2400 "bench"                  python bench.py
echo "=== hw_queue done $(date -u +%H:%M:%S)" >> "$log"

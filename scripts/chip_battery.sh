#!/bin/bash
# Chip measurement battery (VERDICT r4 weak #4: this lived in /tmp and a
# container restart would have deleted the round's validation plan).
#
# Waits for the TPU relay (which can drop for hours — device access HANGS
# in-process, so every probe runs `jax.devices()` in a subprocess with a
# timeout), then runs every chip A/B the pending perf flags need:
#   - entry compile check
#   - bench.py int8 headline + bf16 A/B (each prints the one-line JSON
#     incl. recall_5cm5deg_image from the rendered guard and MFU fields)
#   - profile_stages marginals (never trust standalone microbenchmarks on
#     the relay chip: ~1 ms additive inflation per dispatch)
#   - bench_train bf16 / BENCH_TRAIN_INT8 / PRAM_ATTN_BWD
#   - bench_aachen (AdaGML at the 4096/2048 operating point)
#   - PRAM_INT8_CONV / PRAM_INT8_MLP+PROJ bench runs (flags stay
#     default-OFF until the image-guard recall holds 1.0 under them)
#
# Usage: nohup scripts/chip_battery.sh [outdir] >/tmp/battery.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/meas}
mkdir -p "$OUT"

up=0
for i in $(seq 1 500); do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "CHIP UP at attempt $i ($(date))"; up=1; break
  fi
  echo "attempt $i down ($(date))"
  sleep 60
done
if [ "$up" != "1" ]; then echo "CHIP STILL DOWN after extended wait"; exit 1; fi

echo "=== entry compile check ==="
timeout 900 python -c "import jax, __graft_entry__; fn, a = __graft_entry__.entry(); jax.jit(fn).lower(*a).compile(); print('ENTRY OK')" 2>&1 | tail -2

echo "=== bench.py (int8 headline) ==="
timeout 3600 python bench.py 2>&1 | tail -1 > "$OUT/bench_int8.json"
tail -1 "$OUT/bench_int8.json"

echo "=== bench.py BENCH_INT8=0 (bf16) ==="
BENCH_INT8=0 timeout 3600 python bench.py 2>&1 | tail -1 > "$OUT/bench_bf16.json"
tail -1 "$OUT/bench_bf16.json"

echo "=== profile_stages ==="
timeout 3600 python scripts/profile_stages.py 2>&1 | tail -30 > "$OUT/stages.txt"
cat "$OUT/stages.txt"

echo "=== bench_train (bf16) ==="
timeout 3600 python scripts/bench_train.py 2>&1 | tail -1 > "$OUT/train_bf16.json"
tail -1 "$OUT/train_bf16.json"

echo "=== bench_train BENCH_TRAIN_INT8=1 ==="
BENCH_TRAIN_INT8=1 timeout 3600 python scripts/bench_train.py 2>&1 | tail -1 > "$OUT/train_int8.json"
tail -1 "$OUT/train_int8.json"

echo "=== bench_aachen (int8) ==="
timeout 5400 python scripts/bench_aachen.py 2>&1 | tail -1 > "$OUT/aachen_int8.json"
tail -1 "$OUT/aachen_int8.json"

echo "=== bench.py PRAM_INT8_CONV=1 (Pallas s8 convs) ==="
PRAM_INT8_CONV=1 timeout 3600 python bench.py 2>&1 | tail -1 > "$OUT/bench_int8conv.json"
tail -1 "$OUT/bench_int8conv.json"

echo "=== bench.py PRAM_INT8_MLP=1 PRAM_INT8_PROJ=1 ==="
PRAM_INT8_MLP=1 PRAM_INT8_PROJ=1 timeout 3600 python bench.py 2>&1 | tail -1 > "$OUT/bench_int8mm.json"
tail -1 "$OUT/bench_int8mm.json"

echo "=== bench_train PRAM_ATTN_BWD=0 PRAM_MLP_BWD=0 (XLA-bwd ablation; kernels default ON since r5) ==="
PRAM_ATTN_BWD=0 PRAM_MLP_BWD=0 timeout 3600 python scripts/bench_train.py 2>&1 | tail -1 > "$OUT/train_xlabwd.json"
tail -1 "$OUT/train_xlabwd.json"

echo "=== on-chip grad parity for the backward kernels ==="
timeout 1800 python scripts/exp_bwd_parity_chip.py 2>&1 | tail -1 > "$OUT/bwd_parity.json"
tail -1 "$OUT/bwd_parity.json"

echo "=== profile_stages PRAM_INT8_CONV=1 ==="
PRAM_INT8_CONV=1 timeout 3600 python scripts/profile_stages.py 2>&1 | tail -30 > "$OUT/stages_int8conv.txt"
cat "$OUT/stages_int8conv.txt"

echo "BATTERY DONE ($(date))"

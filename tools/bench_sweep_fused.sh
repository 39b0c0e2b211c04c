#!/bin/bash
# Detached BP4 benchmark sweep with the fused whole-iteration solver
# (compact state, constant operands); appends to /root/repo/BENCH_SWEEP.txt.
# The three production precision configs — split3 (f32-class), split2m
# (bf16-rounded matrices, iteration-exact), bf16 (reduced precision).
cd /root/repo
OUT=/root/repo/BENCH_SWEEP.txt
ERR=/root/repo/tools/SWEEP_STDERR.log
echo "# fused sweep (compact) started $(date -u +%FT%TZ)" >> $OUT
for cfg in "4 13" "2 14" "1 15" "3 14" "5 12" "6 12"; do
  set -- $cfg
  echo "## fused p=$1 s=$2 (split3/pieces, compact)" >> $OUT
  timeout 3000 python -m mf_data_locality_tpu.benchmark $1 $2 1 \
    --solver fused --precision split3 --windowing pieces \
    2>>$ERR | tail -n +2 >> $OUT
done
for cfg in "4 13" "3 14" "5 12" "6 12"; do
  set -- $cfg
  echo "## fused p=$1 s=$2 (split2m/pieces, compact)" >> $OUT
  timeout 3000 python -m mf_data_locality_tpu.benchmark $1 $2 1 \
    --solver fused --precision split2m --windowing pieces \
    2>>$ERR | tail -n +2 >> $OUT
done
for cfg in "4 13" "2 14" "5 12" "6 12"; do
  set -- $cfg
  echo "## fused p=$1 s=$2 bf16 (compact)" >> $OUT
  timeout 3000 python -m mf_data_locality_tpu.benchmark $1 $2 1 \
    --solver fused --dtype bf16 --precision bf16 --windowing pieces \
    --metric-dtype bf16 2>>$ERR | tail -n +2 >> $OUT
done
for prec in split3 split2m; do
  echo "## fused p=2 s=10 convergent ($prec)" >> $OUT
  timeout 3000 python -m mf_data_locality_tpu.benchmark 2 10 1 \
    --solver fused --precision $prec --windowing pieces \
    2>>$ERR | tail -n +2 >> $OUT
done
echo "# fused sweep done $(date -u +%FT%TZ)" >> $OUT

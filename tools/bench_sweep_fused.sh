#!/bin/bash
# Detached BP4 benchmark sweep with the fused whole-iteration solver;
# appends to /root/repo/BENCH_SWEEP.txt progressively.
cd /root/repo
OUT=/root/repo/BENCH_SWEEP.txt
ERR=/root/repo/tools/SWEEP_STDERR.log
echo "# fused-solver sweep (Z-plane in-place state) started $(date -u +%FT%TZ)" >> $OUT
for cfg in "4 13" "2 14" "1 15" "3 14" "5 12" "6 12"; do
  set -- $cfg
  echo "## fused p=$1 s=$2 (split3/pieces)" >> $OUT
  timeout 3000 python -m mf_data_locality_tpu.benchmark $1 $2 1 \
    --solver fused --precision split3 --windowing pieces \
    2>>$ERR | tail -n +2 >> $OUT
done
for cfg in "4 13" "2 14" "6 12"; do
  set -- $cfg
  echo "## fused p=$1 s=$2 bf16 storage + bf16 matmuls + bf16 metric" >> $OUT
  timeout 3000 python -m mf_data_locality_tpu.benchmark $1 $2 1 \
    --solver fused --dtype bf16 --precision bf16 --windowing pieces \
    --metric-dtype bf16 2>>$ERR | tail -n +2 >> $OUT
done
echo "## fused p=2 s=10 convergent point (split3/pieces)" >> $OUT
timeout 3000 python -m mf_data_locality_tpu.benchmark 2 10 1 \
  --solver fused --precision split3 --windowing pieces \
  2>>$ERR | tail -n +2 >> $OUT
echo "# fused sweep done $(date -u +%FT%TZ)" >> $OUT

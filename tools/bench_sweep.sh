#!/bin/bash
# Detached BP4 benchmark sweep; writes /root/repo/BENCH_SWEEP.txt progressively.
cd /root/repo
OUT=/root/repo/BENCH_SWEEP.txt
echo "# BP4 ladder sweep on TPU v5e (merged CG, pallas backend, f32)" > $OUT
echo "# started $(date -u +%FT%TZ)" >> $OUT
for cfg in "2 14" "4 13" "1 15" "3 14" "5 12" "6 12"; do
  set -- $cfg
  echo "## merged p=$1 s=$2" >> $OUT
  timeout 1800 python -m mf_data_locality_tpu.benchmark $1 $2 1 --solver merged 2>/dev/null | tail -n +2 >> $OUT
done
echo "## baseline p=2 s=14" >> $OUT
timeout 1800 python -m mf_data_locality_tpu.benchmark 2 14 1 --solver baseline 2>/dev/null | tail -n +2 >> $OUT
echo "## baseline p=4 s=13" >> $OUT
timeout 1800 python -m mf_data_locality_tpu.benchmark 4 13 1 --solver baseline 2>/dev/null | tail -n +2 >> $OUT
echo "# done $(date -u +%FT%TZ)" >> $OUT

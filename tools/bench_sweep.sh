#!/bin/bash
# Detached BP4 benchmark sweep; writes /root/repo/BENCH_SWEEP.txt progressively.
# Round-2 configs: pieces windowing + split3 (f32-class headline) plus
# bf16-storage reduced-precision rows and a convergent-size row.
cd /root/repo
OUT=/root/repo/BENCH_SWEEP.txt
echo "# BP4 ladder sweep on TPU v5e (merged CG, pallas backend)" > $OUT
echo "# windowing=pieces precision=split3 dtype=f32 unless noted" >> $OUT
echo "# started $(date -u +%FT%TZ)" >> $OUT
for cfg in "2 14" "4 13" "1 15" "3 14" "5 12" "6 12"; do
  set -- $cfg
  echo "## merged p=$1 s=$2 (split3/pieces)" >> $OUT
  timeout 1800 python -m mf_data_locality_tpu.benchmark $1 $2 1 \
    --solver merged --precision split3 --windowing pieces 2>>/root/repo/tools/SWEEP_STDERR.log \
    | tail -n +2 >> $OUT
done
echo "## merged p=2 s=10 convergent point (split3/pieces)" >> $OUT
timeout 1800 python -m mf_data_locality_tpu.benchmark 2 10 1 \
  --solver merged --precision split3 --windowing pieces 2>>/root/repo/tools/SWEEP_STDERR.log \
  | tail -n +2 >> $OUT
echo "## merged p=4 s=13 bf16 storage + bf16 matmuls (pieces)" >> $OUT
timeout 1800 python -m mf_data_locality_tpu.benchmark 4 13 1 \
  --solver merged --dtype bf16 --precision bf16 --windowing pieces \
  2>>/root/repo/tools/SWEEP_STDERR.log | tail -n +2 >> $OUT
echo "## merged p=2 s=14 bf16 storage + bf16 matmuls (pieces)" >> $OUT
timeout 1800 python -m mf_data_locality_tpu.benchmark 2 14 1 \
  --solver merged --dtype bf16 --precision bf16 --windowing pieces \
  2>>/root/repo/tools/SWEEP_STDERR.log | tail -n +2 >> $OUT
echo "## baseline p=2 s=14 (split3/pieces)" >> $OUT
timeout 1800 python -m mf_data_locality_tpu.benchmark 2 14 1 \
  --solver baseline --precision split3 --windowing pieces 2>>/root/repo/tools/SWEEP_STDERR.log \
  | tail -n +2 >> $OUT
echo "## baseline p=4 s=13 (split3/pieces)" >> $OUT
timeout 1800 python -m mf_data_locality_tpu.benchmark 4 13 1 \
  --solver baseline --precision split3 --windowing pieces 2>>/root/repo/tools/SWEEP_STDERR.log \
  | tail -n +2 >> $OUT
echo "# done $(date -u +%FT%TZ)" >> $OUT

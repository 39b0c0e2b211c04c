#!/bin/bash
# Post-sweep fixups: retry p=1 s=15 (row missing, stderr was discarded) and
# recheck the anomalous p=3 matvec timing.  Appends to BENCH_SWEEP.txt.
cd /root/repo
OUT=/root/repo/BENCH_SWEEP.txt
ERR=/root/repo/tools/SWEEP_STDERR.log
echo "## retry merged p=1 s=15 (split3/pieces)" >> $OUT
timeout 1800 python -m mf_data_locality_tpu.benchmark 1 15 1 \
  --solver merged --precision split3 --windowing pieces 2>>$ERR \
  | tail -n +2 >> $OUT
echo "## recheck merged p=3 s=14 (split3/pieces)" >> $OUT
timeout 1800 python -m mf_data_locality_tpu.benchmark 3 14 1 \
  --solver merged --precision split3 --windowing pieces 2>>$ERR \
  | tail -n +2 >> $OUT
echo "# fixups done $(date -u +%FT%TZ)" >> $OUT

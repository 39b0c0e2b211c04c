#!/bin/bash
# Sequenced round-3 final probes (fire once the TPU tunnel is back; idle host!)
cd /root/repo
python tools/probe_prod.py > tools/PROBE_PROD.log 2>&1
python tools/probe_oddq.py > tools/PROBE_ODDQ.log 2>&1
echo done > /tmp/r3_probes_done

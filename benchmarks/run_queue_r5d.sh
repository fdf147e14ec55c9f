#!/bin/bash
# Round-5 fourth TPU queue (gate on the r5c queue shell PID via $1).
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
L=benchmarks/logs_r5
mkdir -p "$L"

if [ -n "$1" ]; then
  while [ -d "/proc/$1" ]; do sleep 30; done
fi

# 9-stretch) 8192^2 plane-ceiling probe. Attempt 1: HTTP 413 (kernel as
# trace constant — fixed with h_split runtime args). Attempt 2: monolithic
# 256 MB device_puts stalled the relay (fixed with chunked upload).
# Attempt 3: backward X-pass at py=128 streams 12 x 4 MB double-buffered
# row windows = VMEM OOM (136.3/128 MB) — fixed with py=64 routing for
# >=8192 planes.
timeout 4500 python -u benchmarks/scale_2048.py --only 8192 \
  > "$L/scale_8192d.log" 2>&1

echo "QUEUE R5D DONE" | tee "$L/QUEUE_R5D_DONE"

#!/bin/bash
# Round-5 follow-up TPU queue (gate on the r5 queue PID via $1).
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
L=benchmarks/logs_r5
mkdir -p "$L"

if [ -n "$1" ]; then
  while [ -d "/proc/$1" ]; do sleep 30; done
fi

# 3-retry) ptycho probe retrieval (complex wavefront probe_initial fixed)
timeout 10800 python -u benchmarks/closed_loop_probe_ptycho.py \
  --n-epochs 60 > "$L/probe_ptycho2.log" 2>&1

# 7) cone_far_mask rerun (the ds_1 volume was size-pruned from the repo)
#    followed by the gauge registration -> gauge_analysis.json
timeout 5400 python -u benchmarks/closed_loop_fullfield.py \
  --preset cone_far --support-mask cone \
  --out benchmarks/artifacts/cone_far_mask \
  > "$L/cone_far_mask_rerun.log" 2>&1
timeout 1800 python -u benchmarks/diag_cone_far.py \
  benchmarks/artifacts/cone_far_mask > "$L/cone_far_mask_gauge.log" 2>&1

# 2-stretch) thick-slab closed loop at a 4096^2 plane
timeout 10800 python -u benchmarks/closed_loop_thick2048.py \
  --size 4096 --nz 16 --n-tilts 3 --n-epochs 200 --n-bubbles 60000 \
  > "$L/thick_4096.log" 2>&1

echo "QUEUE R5B DONE" | tee "$L/QUEUE_R5B_DONE"

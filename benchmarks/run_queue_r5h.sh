#!/bin/bash
# Round-5 eighth TPU queue. Waits for r5g (probe-LR arm) to release the
# chip, then:
#   1) thick-slab 4096^2 closed loop, attempt f: --single-material
#      (beta = r*delta exact reparameterization) halves params/grads/Adam
#      state — ~4 GiB of attempt e's 4.53 GiB HBM overshoot.
#   2) 16384^2 plane-ceiling probe, fwd-only (two grad sets + inputs
#      alone exceed HBM at that size).
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
L=benchmarks/logs_r5
mkdir -p "$L"

while [ ! -f "$L/QUEUE_R5G_DONE" ]; do sleep 30; done

timeout 10800 python -u benchmarks/closed_loop_thick2048.py \
  --size 4096 --nz 16 --n-tilts 3 --n-epochs 200 --n-bubbles 60000 \
  --scoped-vmem-kib 32768 --single-material \
  > "$L/thick_4096f.log" 2>&1

timeout 7200 python -u benchmarks/scale_2048.py --only 16384 --fwd-only \
  > "$L/scale_16384.log" 2>&1

echo "QUEUE R5H DONE" | tee "$L/QUEUE_R5H_DONE"

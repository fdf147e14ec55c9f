#!/bin/bash
# Round-5 seventh TPU queue (fresh session; the r5e/r5f failures were
# root-caused to the Mosaic lane-dim panel bug fixed in b14dfa8 and the
# thick-4096 HBM OOM fixed by donation + true-slab free).
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
L=benchmarks/logs_r5
mkdir -p "$L"

# 1) thick-slab closed loop at 4096^2 (phantom cached in /tmp):
#    donation + slab free should clear the 17.27/15.75 GiB OOM.
timeout 10800 python -u benchmarks/closed_loop_thick2048.py \
  --size 4096 --nz 16 --n-tilts 3 --n-epochs 200 --n-bubbles 60000 \
  --scoped-vmem-kib 32768 \
  > "$L/thick_4096e.log" 2>&1

# 2) 8192^2 plane-ceiling rows (fwd parity passed pre-fix at 1.8e-6;
#    the grad path now routes py=64/qx=128).
timeout 7200 python -u benchmarks/scale_2048.py --only 8192 \
  > "$L/scale_8192e.log" 2>&1

# 3) probe-LR sensitivity arm: the joint ptycho retrieval loses ~0.007
#    loss/epoch at probe_lr=1e-3 — is it LR-limited?
timeout 10800 python -u benchmarks/closed_loop_probe_ptycho.py \
  --n-epochs 60 --only retrieved_plr10x > "$L/probe_ptycho_plr.log" 2>&1

echo "QUEUE R5G DONE" | tee "$L/QUEUE_R5G_DONE"

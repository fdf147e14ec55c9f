#!/bin/bash
# Round-5 sixth TPU queue (gate on the r5e queue shell PID via $1).
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
L=benchmarks/logs_r5
mkdir -p "$L"

if [ -n "$1" ]; then
  while [ -d "/proc/$1" ]; do sleep 30; done
fi

# probe-LR sensitivity arm: the joint ptycho retrieval loses ~0.007
# loss/epoch at probe_lr=1e-3 — is it LR-limited?
timeout 10800 python -u benchmarks/closed_loop_probe_ptycho.py \
  --n-epochs 60 --only retrieved_plr10x > "$L/probe_ptycho_plr.log" 2>&1

echo "QUEUE R5F DONE" | tee "$L/QUEUE_R5F_DONE"

#!/bin/bash
# Round-5 third TPU queue (gate on the 8192 scale-probe PID via $1).
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
L=benchmarks/logs_r5
mkdir -p "$L"

if [ -n "$1" ]; then
  while [ -d "/proc/$1" ]; do sleep 30; done
fi

# 2-stretch retry) thick-slab closed loop at a 4096^2 plane.
# Attempt 1 died in compile: the pallas_call's fused output allocation
# (20 MB) exceeded the default 16 MB scoped-VMEM limit in this program's
# fusion context (scale_2048.py's identical kernel at 4096^2 compiled
# fine standalone). v5e VMEM is 128 MB; raise the scoped limit for this
# program. Client XLA_FLAGS are forwarded per-compile by the relay.
XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=32768" \
timeout 10800 python -u benchmarks/closed_loop_thick2048.py \
  --size 4096 --nz 16 --n-tilts 3 --n-epochs 200 --n-bubbles 60000 \
  > "$L/thick_4096b.log" 2>&1

# 3-follow-up) joint warm-start continuation of the ptycho probe
# retrieval (the full-field twostage study's winning move)
timeout 10800 python -u benchmarks/closed_loop_probe_ptycho.py \
  --n-epochs 60 --only joint_warmstart > "$L/probe_ptycho_warm.log" 2>&1

# driver bench sanity after the long jobs
timeout 1200 python -u bench.py > "$L/bench_r5c.log" 2>&1

echo "QUEUE R5C DONE" | tee "$L/QUEUE_R5C_DONE"

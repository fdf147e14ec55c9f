#!/bin/bash
# Round-5 fifth TPU queue (gate on the r5d queue shell PID via $1).
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
L=benchmarks/logs_r5
mkdir -p "$L"

if [ -n "$1" ]; then
  while [ -d "/proc/$1" ]; do sleep 30; done
fi

# 2-stretch retry 2) thick-slab closed loop at 4096^2. The XLA_FLAGS
# route fatals client-side (CPU XLA rejects the TPU-only flag); pass the
# scoped-VMEM limit per-compile via jit compiler_options instead.
# Phantom is cached from the earlier attempts.
timeout 10800 python -u benchmarks/closed_loop_thick2048.py \
  --size 4096 --nz 16 --n-tilts 3 --n-epochs 200 --n-bubbles 60000 \
  --scoped-vmem-kib 32768 \
  > "$L/thick_4096c.log" 2>&1

# fallback: halve the blocked-kernel row blocks instead (scoped alloc
# scales with py) if the compiler-options route didn't produce a result
if [ ! -f benchmarks/artifacts/thick_4096/result.json ]; then
  BDT_BLOCKED_BLOCK=64 \
  timeout 10800 python -u benchmarks/closed_loop_thick2048.py \
    --size 4096 --nz 16 --n-tilts 3 --n-epochs 200 --n-bubbles 60000 \
    > "$L/thick_4096d.log" 2>&1
fi

echo "QUEUE R5E DONE" | tee "$L/QUEUE_R5E_DONE"

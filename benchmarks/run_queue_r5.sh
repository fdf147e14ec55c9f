#!/bin/bash
# Round-5 TPU job queue (one chip job at a time; pass a PID as $1 to wait
# for a running job first). VERDICT r4 items 3, 5, 6, 2-corroboration, 9.
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
L=benchmarks/logs_r5
mkdir -p "$L"

if [ -n "$1" ]; then
  while [ -d "/proc/$1" ]; do sleep 30; done
fi

# 3) ptycho probe-retrieval closed loop (the engine's standard operating
#    mode; ref ptychography.py:257-267)
timeout 7200 python -u benchmarks/closed_loop_probe_ptycho.py \
  --n-epochs 60 > "$L/probe_ptycho.log" 2>&1

# 5) two-stage probe retrieval: frozen retrieved probe + joint warm-start
timeout 5400 python -u benchmarks/closed_loop_probe_twostage.py \
  --n-epochs 400 > "$L/probe_twostage.log" 2>&1

# 6) mixed-precision multiscale gate on cone_256 regtuned:
#    same-session HIGHEST rerun for a fair clock, then precision=auto
timeout 3600 python -u benchmarks/closed_loop_fullfield.py \
  --preset cone_256 --reg-scale 0.1 \
  --sim-cache benchmarks/sim_cache/cone_256_500.npy \
  --out benchmarks/artifacts/cone_256_regtuned_r5highest \
  > "$L/cone256_r5highest.log" 2>&1
timeout 3600 python -u benchmarks/closed_loop_fullfield.py \
  --preset cone_256 --reg-scale 0.1 --precision auto \
  --sim-cache benchmarks/sim_cache/cone_256_500.npy \
  --out benchmarks/artifacts/cone_256_regtuned_auto \
  > "$L/cone256_auto.log" 2>&1

# 2-corroboration) the 2d_cell recipe scaled 4x in plane area, through the
#    production engine/CLI path
timeout 7200 python -u benchmarks/closed_loop_fullfield.py \
  --preset 2d_cell_2048 \
  --out benchmarks/artifacts/cell_2d_2048 \
  > "$L/cell_2d_2048.log" 2>&1

# 9) single-chip plane-ceiling probe at 8192^2
timeout 7200 python -u benchmarks/scale_2048.py --only 8192 \
  > "$L/scale_8192.log" 2>&1

echo "QUEUE R5 DONE" | tee "$L/QUEUE_R5_DONE"

#!/bin/bash
# Round-4 serialized chip-job queue (one real TPU chip — never overlap).
# Each job logs to benchmarks/logs_r4/ and runs regardless of prior failures.
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
L=benchmarks/logs_r4
mkdir -p "$L"

# Wait for the chip to free: pass the PID of a running chip job as $1
if [ -n "$1" ]; then
  while [ -d "/proc/$1" ]; do sleep 30; done
fi

# 1. Dose sweep: the reference's create_noisy_data.py budgets (VERDICT item 2)
for ph in 1.75e8 1.75e7 1.75e6; do
  timeout 3600 python -u benchmarks/closed_loop_fullfield.py \
    --preset cone_noisy --n-photons "$ph" \
    --out "benchmarks/artifacts/cone_noisy_${ph}" \
    --sim-cache benchmarks/artifacts/cone_256_regtuned/sim_cache_500.npy \
    > "$L/dose_${ph}.log" 2>&1
done

# 2. adhesin_ptycho reg-tuned, extended epochs (VERDICT item 1)
mkdir -p benchmarks/artifacts/adhesin_ptycho_regtuned
ln -f benchmarks/artifacts/adhesin_ptycho_e60/sim_cache_500.npy \
      benchmarks/artifacts/adhesin_ptycho_regtuned/sim_cache_500.npy
timeout 3600 python -u benchmarks/closed_loop_ptycho.py \
  --preset adhesin_ptycho --reg-scale 0.1 --n-epochs 60 \
  --out benchmarks/artifacts/adhesin_ptycho_regtuned \
  > "$L/adhesin_ptycho_regtuned.log" 2>&1

# 3. Probe-retrieval closed loop (VERDICT item 5)
timeout 3600 python -u benchmarks/closed_loop_probe.py --n-epochs 30 \
  > "$L/probe_retrieval.log" 2>&1

# 4. cone_pp with normalized regularizers (VERDICT item 6)
mkdir -p benchmarks/artifacts/cone_pp_256_normreg
ln -f benchmarks/artifacts/cone_pp_256_noreg_e60/sim_cache_256_500.npy \
      benchmarks/artifacts/cone_pp_256_normreg/sim_cache_256_500.npy
timeout 5400 python -u benchmarks/closed_loop_cone_pp.py \
  --n-epochs 20 --reg-scale 0.077 \
  --out benchmarks/artifacts/cone_pp_256_normreg \
  > "$L/cone_pp_normreg.log" 2>&1

# 5. MFU / roofline table (VERDICT item 4)
timeout 5400 python -u benchmarks/mfu_roofline.py \
  > "$L/mfu_roofline.log" 2>&1

# 6. Fused Pallas kernel at HIGH precision, 1024^2 (VERDICT item 4 lever)
timeout 3600 python -u benchmarks/pallas_precision_1024.py \
  > "$L/pallas_prec.log" 2>&1

echo "QUEUE DONE" | tee "$L/QUEUE_DONE"

#!/bin/bash
# Round-4 chip queue, part C (session 2): the remaining VERDICT items.
# One real TPU chip — jobs strictly serialized. Fast measurements first.
# Sim caches are gitignored, so the long closed loops re-simulate once
# into their own cache before reconstructing.
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
L=benchmarks/logs_r4
mkdir -p "$L"

# 1. MFU / roofline table (VERDICT item 4 first half)
timeout 5400 python -u benchmarks/mfu_roofline.py \
  > "$L/mfu_roofline.log" 2>&1

# 2. Fused Pallas kernel at HIGH precision, 1024^2 (VERDICT item 4 lever)
timeout 3600 python -u benchmarks/pallas_precision_1024.py \
  > "$L/pallas_prec.log" 2>&1

# 3. Probe-retrieval closed loop (VERDICT item 5)
timeout 3600 python -u benchmarks/closed_loop_probe.py --n-epochs 30 \
  > "$L/probe_retrieval.log" 2>&1

# 4. cone_pp with normalized regularizers (VERDICT item 6):
#    the diagnostic measured reg/data = 13x at the preset alpha -> scale by 1/13
mkdir -p benchmarks/artifacts/cone_pp_256_normreg
timeout 7200 python -u benchmarks/closed_loop_cone_pp.py \
  --n-epochs 20 --reg-scale 0.077 \
  --out benchmarks/artifacts/cone_pp_256_normreg \
  > "$L/cone_pp_normreg.log" 2>&1

# 5. Extended full-field dose sweep (part B: the noise-floor -> recon
#    crossover; part A's reference budgets were all at the floor).
#    First run simulates the shared noiseless 500-angle stack once.
mkdir -p benchmarks/sim_cache
for ph in 1.75e14 1.75e13 1.75e12 1.75e10; do
  timeout 5400 python -u benchmarks/closed_loop_fullfield.py \
    --preset cone_noisy --n-photons "$ph" \
    --out "benchmarks/artifacts/cone_noisy_${ph}" \
    --sim-cache benchmarks/sim_cache/cone_256_500.npy \
    > "$L/dose_${ph}.log" 2>&1
done

echo "QUEUE C DONE" | tee "$L/QUEUE_C_DONE"

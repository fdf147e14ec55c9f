#!/bin/bash
# Round-4 chip queue, part B: extended full-field dose sweep.
#
# Part A's budgets (1.75e6..1.75e8, the reference's ptycho-scale numbers
# from create_noisy_data.py:20) give SNR 2e-7..2e-5 on the 1-um near-field
# hologram (fringe variance 3e-7): pure noise at every dose, hence the
# identical 0.008 noise-floor FSC rows. The reference's own noisy
# FULL-FIELD files are labeled n2e3/n2e5 (reconstruct_2d.py:16,13) —
# per-pixel-scale budgets, ~1e4-1e6x higher effective dose. This sweep
# extends upward to capture the noise-floor -> reconstruction crossover:
#   budget 1.75e10 -> 6.7e3 ph/px, SNR 2e-3
#   budget 1.75e12 -> 6.7e5 ph/px, SNR 0.2
#   budget 1.75e13 -> 6.7e6 ph/px, SNR 2
#   budget 1.75e14 -> 6.7e7 ph/px, SNR 20
# Pass the PID of the part-A queue shell as $1; waits for it to exit.
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
L=benchmarks/logs_r4
mkdir -p "$L"

if [ -n "$1" ]; then
  while [ -d "/proc/$1" ]; do sleep 30; done
fi

for ph in 1.75e10 1.75e12 1.75e13 1.75e14; do
  timeout 3600 python -u benchmarks/closed_loop_fullfield.py \
    --preset cone_noisy --n-photons "$ph" \
    --out "benchmarks/artifacts/cone_noisy_${ph}" \
    --sim-cache benchmarks/artifacts/cone_256_regtuned/sim_cache_500.npy \
    > "$L/dose_${ph}.log" 2>&1
done

echo "QUEUE B DONE" | tee "$L/QUEUE_B_DONE"

#!/usr/bin/env python
"""Headline benchmark entry point.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: 256^3 multislice propagation throughput (slices/sec/chip) on the
current accelerator, vs the reference's compute path (single-thread NumPy FFT
multislice — every reference preset runs ``cpu_only=True``).
"""

import json
import sys


def main():
    sys.path.insert(0, ".")
    from benchmarks.multislice_bench import run_benchmark
    result = run_benchmark(size=256, n_slices=256, batch=1, n_iters=10)
    out = {k: result[k] for k in ("metric", "value", "unit", "vs_baseline")}
    print(json.dumps(out))


if __name__ == "__main__":
    main()

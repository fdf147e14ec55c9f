"""North-star feasibility: the fully Y-sharded 1024^3 train step.

``shard_z_bench.py --mode virtual`` proved the z-sharded STATE fits, but
its rotation all-gathers the full object, so per-device TRANSIENTS are
still O(N^3) — on a real 16 GB v5e chip the 1024^3 z-sharded step would
OOM even though the resident shards fit. ``shard_object='y'``
(recon/sharded.py) keeps every stage slab-local (rotation acts per Y row,
ref simulation.py:86; the truncated-kernel propagator needs only a
(kernel_size-1)/2 halo, ref cnn_propagator/propagation.py:91-99), so both
state AND transients are O(N^3 / n_ty).

This benchmark records, on an 8-device virtual CPU mesh:
  * the compiled program's own per-device memory analysis
    (argument/output/temp bytes from XLA — the proof the step fits a
    16 GB chip), and
  * one executed train step (slow on 1 host core; correctness at small
    sizes is covered by tests/test_parallel.py::test_y_sharded_*).

Usage:
  PYTHONPATH=. python -u benchmarks/shard_y_bench.py [--size 1024]
      [--ndev 8] [--kernel-size 17] [--analyze-only]
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "benchmarks"


def run_virtual_child(size, ndev, kernel_size, analyze_only):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from beyond_dof_tpu.parallel.mesh import make_mesh
    from beyond_dof_tpu.recon.engine import make_optimizer
    from beyond_dof_tpu.recon.sharded import (build_step_sharded_y,
                                              shard_state_y)

    assert len(jax.devices()) == ndev, jax.devices()
    mesh = make_mesh(n_data=1, tile_yx=(ndev, 1))
    shape = (size, size, size)

    t0 = time.time()
    ysh = NamedSharding(mesh, P("ty", None, None))
    params = {
        "delta": jax.device_put(jnp.full(shape, 1e-7, jnp.float32), ysh),
        "beta": jax.device_put(jnp.full(shape, 1e-8, jnp.float32), ysh),
    }
    mask = jax.device_put(jnp.ones(shape, jnp.float32), ysh)
    tx = make_optimizer(params, 1e-7, 1e-3, "normal", False, 1, True,
                        steps_per_epoch=1, size=ndev)
    opt_state = tx.init(params)
    params, opt_state, mask = shard_state_y(mesh, shape, params, opt_state,
                                            mask)
    probe = np.ones((size, size), np.complex64)
    step, _ = build_step_sharded_y(
        tx, opt_state, mesh, shape, probe, 5000, 1e-7, 1e-4,
        alpha=None, alpha_d=0.0, alpha_b=0.0, gamma=1e-9,
        kernel_size=kernel_size, remat=True)
    theta = jnp.zeros((1,), jnp.float32)
    prj = jax.device_put(jnp.ones((1, size, size), jnp.float32),
                         NamedSharding(mesh, P(None, "ty", None)))
    t_build = time.time() - t0

    # per-device memory analysis of the compiled SPMD program
    t0 = time.time()
    compiled = step.lower(params, opt_state, mask, theta, prj,
                          jnp.int32(0)).compile()
    t_compile = time.time() - t0
    ma = compiled.memory_analysis()
    mem = {}
    if ma is not None:
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "alias_size_in_bytes",
                  "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                mem[k] = int(v)
    # donation aliases params/opt_state/mask in-place: live per-device =
    # arguments (aliased + streamed) + temps
    live = (mem.get("argument_size_in_bytes", 0)
            + mem.get("temp_size_in_bytes", 0))
    result = {
        "metric": "y_sharded_train_step_%d_feasibility" % size,
        "size": size, "ndev": ndev, "kernel_size": kernel_size,
        "build_seconds": round(t_build, 1),
        "compile_seconds": round(t_compile, 1),
        "per_device_memory": mem,
        "per_device_live_gb": round(live / 2 ** 30, 3),
        "state_gb_total": round(
            sum(x.nbytes for x in jax.tree.leaves((params, opt_state, mask))
                if getattr(x, "ndim", 0) == 3) / 2 ** 30, 2),
    }
    print("ANALYSIS " + json.dumps(result), flush=True)

    if not analyze_only:
        t0 = time.time()
        out = step(params, opt_state, mask, theta, prj, jnp.int32(0))
        loss = float(out[3])
        t_step = time.time() - t0
        shard_bytes = [s.data.nbytes
                       for s in out[0]["delta"].addressable_shards]
        result.update({
            "value": round(t_step, 1),
            "unit": "s (compile cached + 1 step, %d virtual CPU devices on "
                    "1 host core)" % ndev,
            "loss": loss,
            "delta_shard_bytes_per_device": shard_bytes[0],
            "n_shards": len(shard_bytes),
        })
    print("RESULT " + json.dumps(result), flush=True)


def run_virtual(size=1024, ndev=8, kernel_size=17, analyze_only=False):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=%d" % ndev
        + " --xla_cpu_collective_call_terminate_timeout_seconds=28800"
        + " --xla_cpu_collective_timeout_seconds=28800")
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    code = ("import benchmarks.shard_y_bench as m; "
            "m.run_virtual_child(%d, %d, %d, %r)"
            % (size, ndev, kernel_size, analyze_only))
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-u", "-c", code], env=env,
                          capture_output=True, text=True)
    print(proc.stdout[-4000:], flush=True)
    if proc.returncode != 0:
        print(proc.stderr[-6000:], flush=True)
        raise SystemExit("virtual run failed")
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
            result["wall_seconds"] = round(time.time() - t0, 1)
            path = os.path.join(OUT, "shard_y_virtual_%d.json" % size)
            with open(path, "w") as f:
                json.dump(result, f, indent=1)
            return result
    raise SystemExit("no RESULT line")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--ndev", type=int, default=8)
    ap.add_argument("--kernel-size", type=int, default=17)
    ap.add_argument("--analyze-only", action="store_true")
    a = ap.parse_args()
    print(json.dumps(run_virtual(a.size, a.ndev, a.kernel_size,
                                 a.analyze_only)), flush=True)

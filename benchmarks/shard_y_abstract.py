"""Abstract (no-buffer) memory analysis of the Y-sharded train step at
sizes whose host arrays cannot be materialized.

`shard_y_bench.py` proves 1024^3 fits a 16 GB v5e by compiling the real
program and EXECUTING it on the virtual mesh — but it materializes the
full params/opt-state on the host, which caps it at ~1024^3 (the 2048^3
state alone is ~275 GB host RAM). This variant lowers the SAME
`build_step_sharded_y` program from `jax.ShapeDtypeStruct`s carrying the
production `NamedSharding`s — XLA compiles and reports per-device
argument/temp sizes without a single buffer being allocated — extending
the north-star feasibility analysis to 2048^3 on larger meshes.

Compile-only by construction (there is nothing to execute). The executed
1024^3 step (`shard_y_virtual_1024_executed.json`) anchors the analysis:
at 1024^3/8dev this abstract path reports the same per-device numbers as
the materialized one.

Usage:
  python -u benchmarks/shard_y_abstract.py --size 2048 --ndev 64
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "benchmarks"


def run_child(size, ndev, kernel_size):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from beyond_dof_tpu.parallel.mesh import make_mesh
    from beyond_dof_tpu.recon.engine import make_optimizer
    from beyond_dof_tpu.recon.sharded import build_step_sharded_y

    assert len(jax.devices()) == ndev, jax.devices()
    mesh = make_mesh(n_data=1, tile_yx=(ndev, 1))
    shape = (size, size, size)
    ysh = NamedSharding(mesh, P("ty", None, None))
    rep = NamedSharding(mesh, P())

    def vol(sharding=ysh):
        return jax.ShapeDtypeStruct(shape, jnp.float32, sharding=sharding)

    t0 = time.time()
    params = {"delta": vol(), "beta": vol()}
    # optimizer state SHAPES from eval_shape (no moment buffers); then
    # attach the same Y-slab shardings shard_state_y would use
    tx = make_optimizer({"delta": 0, "beta": 0}, 1e-7, 1e-3, "normal",
                        False, 1, True, steps_per_epoch=1, size=ndev)
    opt_shapes = jax.eval_shape(
        tx.init, {"delta": jax.ShapeDtypeStruct(shape, jnp.float32),
                  "beta": jax.ShapeDtypeStruct(shape, jnp.float32)})

    def attach(x):
        if getattr(x, "ndim", 0) == 3 and tuple(x.shape) == tuple(shape):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=ysh)
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep)

    opt_state = jax.tree.map(attach, opt_shapes)
    mask = vol()
    probe = np.ones((size, size), np.complex64)
    step, _ = build_step_sharded_y(
        tx, opt_state, mesh, shape, probe, 5000, 1e-7, 1e-4,
        alpha=None, alpha_d=0.0, alpha_b=0.0, gamma=1e-9,
        kernel_size=kernel_size, remat=True)
    theta = jax.ShapeDtypeStruct((1,), jnp.float32, sharding=rep)
    prj = jax.ShapeDtypeStruct((1, size, size), jnp.float32,
                               sharding=NamedSharding(mesh,
                                                      P(None, "ty", None)))
    idx = jax.ShapeDtypeStruct((), jnp.int32, sharding=rep)
    t_build = time.time() - t0

    t0 = time.time()
    compiled = step.lower(params, opt_state, mask, theta, prj, idx).compile()
    t_compile = time.time() - t0
    ma = compiled.memory_analysis()
    mem = {k: int(getattr(ma, k)) for k in
           ("argument_size_in_bytes", "output_size_in_bytes",
            "temp_size_in_bytes", "alias_size_in_bytes")
           if getattr(ma, k, None) is not None}
    live = (mem.get("argument_size_in_bytes", 0)
            + mem.get("temp_size_in_bytes", 0))
    state_gb = (5 * np.prod(shape, dtype=np.float64) * 4) / 2 ** 30

    result = {
        "metric": "y_sharded_train_step_%d_abstract_feasibility" % size,
        "size": size, "ndev": ndev, "kernel_size": kernel_size,
        "build_seconds": round(t_build, 1),
        "compile_seconds": round(t_compile, 1),
        "per_device_memory": mem,
        "per_device_live_gb": round(live / 2 ** 30, 3),
        "state_gb_total_approx": round(float(state_gb), 1),
        "value": round(live / 2 ** 30, 3),
        "unit": "GB live per device (XLA memory analysis, abstract lowering)",
    }
    print("RESULT " + json.dumps(result), flush=True)


def run(size, ndev, kernel_size):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=%d" % ndev)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    code = ("import benchmarks.shard_y_abstract as m; "
            "m.run_child(%d, %d, %d)" % (size, ndev, kernel_size))
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-u", "-c", code], env=env,
                          capture_output=True, text=True)
    print(proc.stdout[-4000:], flush=True)
    if proc.returncode != 0:
        print(proc.stderr[-6000:], flush=True)
        raise SystemExit("abstract run failed")
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
            result["wall_seconds"] = round(time.time() - t0, 1)
            path = os.path.join(
                OUT, "shard_y_abstract_%d_%d.json" % (size, ndev))
            with open(path, "w") as f:
                json.dump(result, f, indent=1)
            return result
    raise SystemExit("no RESULT line")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--ndev", type=int, default=64)
    ap.add_argument("--kernel-size", type=int, default=17)
    a = ap.parse_args()
    run(a.size, a.ndev, a.kernel_size)

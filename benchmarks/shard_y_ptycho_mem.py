"""Y-sharded PTYCHO train step feasibility at 512^3 / 1024^3 (VERDICT r3 item 7).

The full-field Y-shard (recon/sharded.py) covers the north-star full-field
path; this records the same XLA memory-analysis evidence for the
ptycho-tomography step (recon/sharded_ptycho.py): probe windows crossing
Y-slab boundaries are served by a per-angle halo row exchange, so both the
training state AND the transients stay O(N^3/n_ty + probe-overlap).

Workload shape follows the reference's params_cone_marc ptychography
(ref reconstruct_ptycho.py:44-77): a 23x23 grid of 72^2 probe windows,
positions scaled to the volume size, n_dp_batch window chunking
(ref ptychography.py:40,64-91).

Numerical parity of the sharded step is covered by
tests/test_sharded_ptycho.py; this benchmark is about MEMORY at scale —
analyze-only by default (executing a 1024^3-class step on 8 virtual CPU
devices would put every temp arena in one host RAM).

Usage:
  PYTHONPATH=. python -u benchmarks/shard_y_ptycho_mem.py [--size 512]
      [--ndev 8] [--execute]
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


def run_virtual_child(size, ndev, execute, n_dp_batch=20,
                      remat="invertible", ext_dtype=None,
                      checkpoint_ext=False):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from beyond_dof_tpu.parallel.mesh import make_mesh
    from beyond_dof_tpu.recon.engine import make_optimizer
    from beyond_dof_tpu.recon.sharded import shard_state_y
    from beyond_dof_tpu.recon.sharded_ptycho import (
        build_step_sharded_y_ptycho, arrange_data_y, build_job_tables)

    assert len(jax.devices()) == ndev, jax.devices()
    mesh = make_mesh(n_data=1, tile_yx=(ndev, 1))
    shape = (size, size, size)
    probe_size = (72, 72)
    # 23x23 grid of positions spanning the plane (params_cone_marc geometry
    # scaled to the volume): step chosen so windows stay inside the volume
    step_px = max(1, (size - probe_size[0]) // 22)
    coords = 36 + np.arange(23) * step_px
    probe_pos = np.array([(y, x) for y in coords for x in coords], dtype=int)

    t0 = time.time()
    params = {"delta": jnp.full(shape, 1e-7, jnp.float32),
              "beta": jnp.full(shape, 1e-8, jnp.float32)}
    mask = jnp.ones(shape, jnp.float32)
    tx = make_optimizer(params, 1e-7, 1e-3, "normal", False, 1, True,
                        steps_per_epoch=1, size=ndev)
    opt_state = tx.init(params)
    params, opt_state, mask = shard_state_y(mesh, shape, params, opt_state,
                                            mask)
    rng = np.random.RandomState(0)
    p_re = rng.rand(*probe_size).astype(np.float32)
    p_im = rng.rand(*probe_size).astype(np.float32) * 0.1

    step, _ = build_step_sharded_y_ptycho(
        tx, opt_state, mesh, shape, p_re, p_im, probe_pos, probe_size,
        5000, 1e-7, free_prop_cm="inf", alpha_d=1e-9, alpha_b=1e-10,
        gamma=1e-9, n_dp_batch=n_dp_batch, remat=remat,
        ext_dtype=ext_dtype, checkpoint_ext=checkpoint_ext)

    tables, weights, halo = build_job_tables(probe_pos, probe_size, shape,
                                             ndev)
    mag = np.ones((len(probe_pos),) + probe_size, np.float32)
    mag_slabs = jnp.asarray(arrange_data_y(mag, probe_pos, probe_size,
                                           shape, ndev))
    from jax.sharding import NamedSharding, PartitionSpec as P
    mag_slabs = jax.device_put(mag_slabs,
                               NamedSharding(mesh, P("ty", None, None, None)))
    theta = jnp.float32(0.3)
    t_build = time.time() - t0

    t0 = time.time()
    compiled = step.lower(params, opt_state, mask, theta, mag_slabs,
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
    live = (mem.get("argument_size_in_bytes", 0)
            + mem.get("temp_size_in_bytes", 0))
    result = {
        "metric": "y_sharded_PTYCHO_train_step_%d_feasibility" % size,
        "size": size, "ndev": ndev, "probe": list(probe_size),
        "n_pos": int(len(probe_pos)), "n_dp_batch": n_dp_batch,
        "remat": str(remat), "ext_dtype": ext_dtype,
        "checkpoint_ext": bool(checkpoint_ext),
        "halo_rows": int(halo), "max_jobs_per_slab": int(tables.shape[1]),
        "build_seconds": round(t_build, 1),
        "compile_seconds": round(t_compile, 1),
        "per_device_memory": mem,
        "per_device_live_gb": round(live / 2 ** 30, 3),
        "state_gb_total": round(
            sum(x.nbytes for x in jax.tree.leaves((params, opt_state, mask))
                if getattr(x, "ndim", 0) == 3) / 2 ** 30, 2),
    }
    print("ANALYSIS " + json.dumps(result), flush=True)

    if execute:
        t0 = time.time()
        out = step(params, opt_state, mask, theta, mag_slabs, jnp.int32(0))
        loss = float(out[3])
        result.update({"step_seconds": round(time.time() - t0, 1),
                       "loss": loss})
    print("RESULT " + json.dumps(result), flush=True)


def run_virtual(size=512, ndev=8, execute=False, n_dp_batch=20,
                remat="invertible", ext_dtype=None, checkpoint_ext=False,
                tag=""):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=%d" % ndev
        + " --xla_cpu_collective_call_terminate_timeout_seconds=28800"
        + " --xla_cpu_collective_timeout_seconds=28800")
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    code = ("import benchmarks.shard_y_ptycho_mem as m; "
            "m.run_virtual_child(%d, %d, %r, n_dp_batch=%d, remat=%r, "
            "ext_dtype=%r, checkpoint_ext=%r)"
            % (size, ndev, execute, n_dp_batch, remat, ext_dtype,
               checkpoint_ext))
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-u", "-c", code], env=env,
                          capture_output=True, text=True)
    print(proc.stdout[-4000:], flush=True)
    if proc.returncode != 0:
        print(proc.stderr[-4000:], flush=True)
        raise SystemExit("child failed")
    line = [l for l in proc.stdout.splitlines()
            if l.startswith("RESULT ")][-1]
    result = json.loads(line[len("RESULT "):])
    result["wall_seconds"] = round(time.time() - t0, 1)
    suffix = ("_" + tag if tag else "") + ("_executed" if execute else "")
    fname = os.path.join(OUT, "shard_y_ptycho_%d%s.json" % (size, suffix))
    with open(fname, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--ndev", type=int, default=8)
    ap.add_argument("--execute", action="store_true")
    ap.add_argument("--n-dp-batch", type=int, default=20)
    ap.add_argument("--remat", default="invertible")
    ap.add_argument("--ext-dtype", default=None)
    ap.add_argument("--checkpoint-ext", action="store_true")
    ap.add_argument("--tag", default="")
    a = ap.parse_args()
    remat = {"True": True, "False": False}.get(a.remat, a.remat)
    run_virtual(a.size, a.ndev, a.execute, a.n_dp_batch, remat,
                a.ext_dtype, a.checkpoint_ext, a.tag)

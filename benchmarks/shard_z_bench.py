"""Large-object (north-star) reconstruction feasibility benchmarks.

Two records VERDICT r2 asked for (SURVEY §2 "shard the 1024^3 delta/beta
grids + Adam moments over the mesh"):

  --mode chip     a 512^3 full-field TRAIN STEP on the real chip (fits one
                  chip: ~3.5 GB of f32 training state), measured step time
                  and HBM peak. Runs through the real engine
                  (recon.fullfield.reconstruct_fullfield).

  --mode virtual  the 1024^3 train step with the object + Adam moments
                  Z-SHARDED over an 8-device virtual CPU mesh
                  (shard_object='z' semantics: params/opt-state/mask in
                  P(None, None, 'data')). 1024^3 training state is ~26 GB
                  of f32 — more than one v5e chip's HBM — so this sharding
                  is exactly what makes the north star fit on a v5e-8;
                  executing it on the virtual mesh proves the sharded
                  program compiles and runs and records per-device shard
                  bytes. Numerical equivalence of the z-sharded step is
                  covered bitwise at 16^3 by tests/test_parallel.py.

Usage:
  PYTHONPATH=. python -u benchmarks/shard_z_bench.py --mode chip [--size 512]
  PYTHONPATH=. python -u benchmarks/shard_z_bench.py --mode virtual
      [--size 1024] [--ndev 8]
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


def run_chip(size=512, n_theta=4, n_epochs=2):
    import jax
    from beyond_dof_tpu.recon.fullfield import reconstruct_fullfield

    rng = np.random.RandomState(0)
    data = (1.0 + 1e-4 * rng.randn(n_theta, size, size)).astype(np.complex64)

    epoch_times = []
    t_mark = [time.time()]
    import beyond_dof_tpu.recon.fullfield as ff
    orig = ff.print_flush

    def probe_log(*a, **k):
        msg = " ".join(str(x) for x in a)
        if msg.startswith("Iteration"):
            now = time.time()
            epoch_times.append(round(now - t_mark[0], 3))
            t_mark[0] = now
        orig(*a, **k)

    ff.print_flush = probe_log
    try:
        reconstruct_fullfield(
            data=data, n_epochs=n_epochs, minibatch_size=1,
            alpha_d=0, alpha_b=0, gamma=0, learning_rate=1e-7,
            energy_ev=5000, psize_cm=1e-7, free_prop_cm=1e-4,
            multiscale_level=1, shrink_cycle=None, save_outputs=False,
            verbose=True, seed=0)
    finally:
        ff.print_flush = orig

    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        mem = {k: int(v) for k, v in stats.items()
               if "bytes" in k or "size" in k}
    except Exception as e:
        mem = {"error": repr(e)}
    # epoch 0 includes compile; steady epoch has n_theta steps
    steady = epoch_times[-1] if len(epoch_times) > 1 else epoch_times[0]
    result = {
        "metric": "fullfield_train_step_%d" % size,
        "value": round(steady / n_theta, 3), "unit": "s/step",
        "size": size, "n_theta": n_theta, "epoch_times": epoch_times,
        "hbm": mem,
    }
    path = os.path.join(OUT, "shard_z_chip_%d.json" % size)
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)
    return result


def run_virtual_child(size, ndev):
    """Executed in the bootstrapped subprocess: CPU platform, ndev devices."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from beyond_dof_tpu.parallel.mesh import make_mesh, replicated
    from beyond_dof_tpu.recon.fullfield import _build_step
    from beyond_dof_tpu.recon.engine import make_optimizer
    from beyond_dof_tpu.ops.fresnel import get_kernel

    assert len(jax.devices()) == ndev, jax.devices()
    mesh = make_mesh(n_data=ndev)
    zshard = NamedSharding(mesh, P(None, None, "data"))
    rep = replicated(mesh)

    t0 = time.time()
    shape = (size, size, size)
    # z-sharded object + mask (the 26 GB state of the real 1024^3 problem)
    params = {
        "delta": jax.device_put(jnp.full(shape, 1e-7, jnp.float32), zshard),
        "beta": jax.device_put(jnp.full(shape, 1e-8, jnp.float32), zshard),
    }
    mask = jax.device_put(jnp.ones(shape, jnp.float32), zshard)
    tx = make_optimizer(params, 1e-7, 1e-3, "normal", False, 1, True,
                        steps_per_epoch=1, size=ndev)
    opt_state = jax.tree.map(
        lambda x: (jax.device_put(x, zshard)
                   if getattr(x, "ndim", 0) == 3 and x.shape == shape
                   else jax.device_put(x, rep)),
        tx.init(params))

    psize_cm = 1e-7
    voxel_nm = np.array([psize_cm] * 3) * 1e7
    lmbda_nm = 1240.0 / 5000
    h = get_kernel(voxel_nm[-1], lmbda_nm, voxel_nm, (size, size))
    probe = np.ones((size, size), np.complex64)
    step, _ = _build_step(tx, probe, 5000, psize_cm, 1e-4, h, 1e-7, 0, 0, 0,
                          "fresnel", False, None, None, None, 1e-15, True,
                          True, split_complex=True)
    theta = jax.device_put(jnp.zeros((1,), jnp.float32), rep)
    prj = jax.device_put(jnp.ones((1, size, size), jnp.float32), rep)
    t_build = time.time() - t0

    t0 = time.time()
    out = step(params, opt_state, mask, theta, prj, jnp.int32(0))
    loss = float(out[3])
    t_step = time.time() - t0

    shard_bytes = [s.data.nbytes for s in out[0]["delta"].addressable_shards]
    state_bytes_per_dev = 0
    # out[2] is the post-step mask: the input mask was donated to the step
    for leaf in jax.tree.leaves((out[0], out[1], out[2])):
        if getattr(leaf, "ndim", 0) == 3 and leaf.shape == shape:
            state_bytes_per_dev += leaf.addressable_shards[0].data.nbytes
    result = {
        "metric": "z_sharded_train_step_%d_feasibility" % size,
        "value": round(t_step, 1), "unit": "s (compile+1 step, %d virtual "
        "CPU devices on 1 host core)" % ndev,
        "size": size, "ndev": ndev, "loss": loss,
        "build_seconds": round(t_build, 1),
        "delta_shard_bytes_per_device": shard_bytes[0],
        "n_shards": len(shard_bytes),
        "sharded_state_bytes_per_device": int(state_bytes_per_dev),
        "sharded_state_gb_total": round(
            state_bytes_per_dev * ndev / 2 ** 30, 2),
    }
    print("RESULT " + json.dumps(result), flush=True)


def run_virtual(size=1024, ndev=8):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=%d" % ndev
        # 8 device threads time-share the host cores, so participants can
        # take minutes to reach a collective rendezvous; the default 40 s
        # stuck-watchdog aborts the process (F rendezvous.cc) at >=512^3
        # (the matching warn_stuck flag is not registered in this build)
        + " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
        + " --xla_cpu_collective_timeout_seconds=7200")
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    code = ("import benchmarks.shard_z_bench as m; "
            "m.run_virtual_child(%d, %d)" % (size, ndev))
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-u", "-c", code], env=env,
                          capture_output=True, text=True)
    print(proc.stdout[-4000:], flush=True)
    if proc.returncode != 0:
        print(proc.stderr[-4000:], flush=True)
        raise SystemExit("virtual run failed")
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
            result["wall_seconds"] = round(time.time() - t0, 1)
            path = os.path.join(OUT, "shard_z_virtual_%d.json" % size)
            with open(path, "w") as f:
                json.dump(result, f, indent=1)
            return result
    raise SystemExit("no RESULT line")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["chip", "virtual"], required=True)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--ndev", type=int, default=8)
    a = ap.parse_args()
    if a.mode == "chip":
        run_chip(a.size or 512)
    else:
        print(json.dumps(run_virtual(a.size or 1024, a.ndev)), flush=True)

"""Multi-process (2-host-equivalent) smoke test on localhost CPU.

Covers ``jax.distributed.initialize`` startup (parallel/mesh.py:51-61),
cross-process mesh construction, a data-parallel gradient step whose
allreduce crosses the process boundary, and ``broadcast_flag`` — the
TPU-native equivalents of the reference's hvd.init / comm.bcast /
.stop_iteration machinery (ref tensorflow_recon/fullfield.py:118-145,
498-503). Runs two real subprocesses; skips where the distributed
runtime is unsupported.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "_multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_step():
    coordinator = "127.0.0.1:%d" % _free_port()
    env = dict(os.environ)
    # one CPU device per process (override conftest's 8-device forcing);
    # drop any TPU/axon platform selection for the children
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_PLATFORM_NAME", None)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=os.path.dirname(HERE), text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=150)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed runtime did not come up in time")

    for rc, out, err in outs:
        if rc != 0 and ("UNIMPLEMENTED" in err or "not supported" in err):
            pytest.skip("jax.distributed unsupported on this build: %s"
                        % err.strip().splitlines()[-1:])
        assert rc == 0, "worker failed:\nstdout:%s\nstderr:%s" % (out, err)

    results = [json.loads(out.strip().splitlines()[-1]) for _, out, _ in outs]
    for r in results:
        assert r["process_count"] == 2
        assert r["n_global_devices"] == 2
        assert r["mesh_shape"] == [2, 1, 1]
        # DP gradient == serial oracle through the cross-process allreduce
        assert r["grad_err"] < 1e-5
        # process 0's stop decision reached both hosts
        assert r["flag"] is True
    assert sorted(r["process_id"] for r in results) == [0, 1]

"""Multi-host wiring: jax.distributed.initialize + per-host batch sharding
(parallel/mesh.py init_distributed/shard_batch; reference DDP init,
ref train.py:30-35).

Spawns 2 real processes (gloo collectives over localhost, 4 virtual CPU
devices each) and checks their cross-host training result against the
same math run single-process in this test.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest

import _mh_worker


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_matches_single_process():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    # single-process reference on the in-test 8-device CPU mesh
    from ctts_tpu.parallel.mesh import make_mesh, shard_batch
    x, y, params = _mh_worker.make_data()
    mesh = make_mesh(data=8, model=1)
    ref = _mh_worker.checksum(
        _mh_worker.run_training(mesh, x, y, params, shard_batch))

    # two real processes over gloo
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_mh_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("CTTS_COORDINATOR", "CTTS_NUM_PROCESSES",
                        "CTTS_PROCESS_ID", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    finals = []
    for out in outs:
        assert "CKPT_OK" in out, f"checkpoint gather failed:\n{out}"
        lines = [ln for ln in out.splitlines() if ln.startswith("FINAL ")]
        assert lines, f"no FINAL line in:\n{out}"
        finals.append(float(lines[-1].split()[1]))

    # both hosts converge to the identical replicated params, and they
    # match the single-process run (same global batch, same init)
    assert finals[0] == finals[1]
    np.testing.assert_allclose(finals[0], ref, rtol=1e-5)

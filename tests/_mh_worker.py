"""Worker process for the multi-host test (tests/test_multihost.py).

Run as `python tests/_mh_worker.py <process_id> <port>`: joins a 2-process
gloo cluster with 4 virtual CPU devices per process (8 global), builds the
repo's ('data','model') mesh, assembles a host-sharded global batch with
shard_batch, and runs a tiny SGD loop whose gradient all-reduce crosses
hosts. Prints `FINAL <checksum>` — the single-process test asserts both
workers print the checksum it computes locally.
"""

import os
import sys

import numpy as np


def make_data():
    rng = np.random.RandomState(0)
    x = rng.randn(8, 16).astype(np.float32)
    y = rng.randn(8, 4).astype(np.float32)
    w1 = rng.randn(16, 32).astype(np.float32) * 0.1
    w2 = rng.randn(32, 4).astype(np.float32) * 0.1
    return x, y, {"w1": w1, "w2": w2}


def run_training(mesh, x_global, y_global, params, shard_batch_fn):
    """3 SGD steps on a 2-layer MLP; batch sharded over 'data'."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch = shard_batch_fn({"x": x_global, "y": y_global}, mesh)
    params = jax.device_put(params, NamedSharding(mesh, P()))

    def loss_fn(p, b):
        h = jnp.tanh(b["x"] @ p["w1"])
        return jnp.mean((h @ p["w2"] - b["y"]) ** 2)

    @jax.jit
    def step(p, b):
        g = jax.grad(loss_fn)(p, b)
        return jax.tree.map(lambda w, d: w - 0.1 * d, p, g)

    with mesh:
        for _ in range(3):
            params = step(params, batch)
    return params


def checksum(params):
    import jax
    leaves = jax.tree.leaves(jax.device_get(params))
    return float(sum(np.abs(l).sum() for l in leaves))


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    # exercise the env-var path of init_distributed
    os.environ["CTTS_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["CTTS_NUM_PROCESSES"] = "2"
    os.environ["CTTS_PROCESS_ID"] = str(pid)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from ctts_tpu.parallel.mesh import init_distributed, make_mesh, \
        shard_batch
    assert init_distributed(), "env-driven init_distributed returned False"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    mesh = make_mesh(data=8, model=1)
    x, y, params = make_data()
    # per-host slice of the global batch (DistributedSampler equivalent)
    lo, hi = pid * 4, (pid + 1) * 4
    params = run_training(mesh, x[lo:hi], y[lo:hi], params, shard_batch)

    # checkpoint gather invariants (train.py _save_ckpt): global sharded
    # leaves come back at their GLOBAL shape, fully-addressable leaves
    # (e.g. a step counter saved before any jitted step runs) keep their
    # shape instead of being stacked across the 2 processes
    from ctts_tpu.utils.checkpoint import gather_for_save
    import jax.numpy as jnp
    state = {"params": params,
             "step": jnp.zeros((), jnp.int32),        # fully addressable
             "hist": jnp.ones((3,), jnp.float32)}     # fully addressable
    gathered = gather_for_save(state)
    assert gathered["params"]["w1"].shape == (16, 32), \
        gathered["params"]["w1"].shape
    assert gathered["step"].shape == (), gathered["step"].shape
    assert gathered["hist"].shape == (3,), gathered["hist"].shape
    print("CKPT_OK", flush=True)

    print(f"FINAL {checksum(params):.6f}", flush=True)


if __name__ == "__main__":
    main()

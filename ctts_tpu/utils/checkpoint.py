"""Checkpointing: orbax save/restore with the reference's step-keyed layout.

Reference contract (train.py:190-200, utils/model.py:11-34): checkpoints
keyed by step under ckpt_path; resume restores model + optimizer and the LR
schedule recomputes from the restored step. Orbax gives atomic, async-able,
shard-aware saves — the TPU-native upgrade over torch.save of state_dicts.
"""

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def gather_for_save(state):
    """Bring a (possibly multihost-sharded) train state fully to host.

    Per-leaf, not per-tree: `multihost_utils.process_allgather` treats a
    fully-addressable leaf (e.g. a scalar created outside the jitted step,
    saved before any step runs) as per-process data and would stack it
    across processes, corrupting its shape in the checkpoint. Such leaves
    are replicated by construction here (every host computes them
    identically), so they are read locally; only global sharded arrays go
    through the allgather.
    """
    if jax.process_count() <= 1:
        return jax.device_get(state)
    from jax.experimental import multihost_utils

    def gather(leaf):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            return multihost_utils.process_allgather(leaf, tiled=True)
        return np.asarray(leaf)

    return jax.tree.map(gather, state)


def _manager(ckpt_dir, max_to_keep=None):
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save_checkpoint(ckpt_dir, state, step, max_to_keep=None):
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(ckpt_dir, state, step=None):
    """Restore into the structure of `state` (shapes/shardings preserved).
    step=None → latest. Returns (state, restored_step)."""
    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            mgr.close()
            return state, 0
    restored = mgr.restore(step, args=ocp.args.StandardRestore(state))
    mgr.close()
    return restored, step


def restore_checkpoint_raw(ckpt_dir, step=None):
    """Restore the on-disk tree as host numpy arrays, no template.

    For consumers whose init-time tree is a SUBSET of the saved one (e.g.
    bench.py inits in infer mode, which never calls the aligner, while the
    checkpoint came from a train_unsup state) — flax `apply` ignores unused
    params, so handing it the full saved tree is safe. Returns (tree, step);
    (None, 0) if the directory holds no checkpoint."""
    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            mgr.close()
            return None, 0
    restored = mgr.restore(step, args=ocp.args.PyTreeRestore())
    mgr.close()
    return restored, step


def pack_params_npz(tree, path, step):
    """Pack a (nested-dict) variables tree into one compressed .npz.

    Purpose: a git-committable weights artifact. Orbax checkpoints are
    directories of sharded fp32 arrays (~140 MB for the flagship) that live
    under the gitignored output/; this packs the same tree to roughly a
    third of that by storing float leaves as bfloat16 (exactly the precision
    the bf16 compute path reads anyway) inside a single npz. Float arrays
    are stored as uint16 bit-views because numpy's .npy format cannot
    serialize the ml_dtypes bfloat16 dtype; the manifest records the
    original dtype so load restores fp32 leaves (values rounded to the
    nearest bf16, i.e. what the MXU consumed at train time).
    """
    import json

    import ml_dtypes

    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                assert "/" not in str(k), f"param name contains '/': {k}"
                walk(v, prefix + (str(k),))
        else:
            flat["/".join(prefix)] = np.asarray(node)

    walk(tree, ())
    manifest, arrays = {"step": int(step), "leaves": {}}, {}
    for i, (key, arr) in enumerate(sorted(flat.items())):
        name = f"a{i}"
        if (arr.dtype in (np.float32, np.float64, np.float16)
                or arr.dtype == ml_dtypes.bfloat16):
            # bf16/f16 leaves also route here: np.savez cannot serialize
            # the ml_dtypes bfloat16 dtype directly
            arrays[name] = arr.astype(ml_dtypes.bfloat16).view(np.uint16)
            manifest["leaves"][key] = {"n": name, "dtype": "bfloat16"}
        else:
            arrays[name] = arr
            manifest["leaves"][key] = {"n": name, "dtype": str(arr.dtype)}
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_params_npz(path):
    """Inverse of pack_params_npz → (nested-dict tree, step).

    bfloat16-packed leaves come back as float32 (bf16-rounded values);
    integer/bool leaves come back bit-exact.
    """
    import json

    import ml_dtypes

    with np.load(path) as z:
        manifest = json.loads(bytes(z["__manifest__"]).decode())
        tree = {}
        for key, spec in manifest["leaves"].items():
            arr = z[spec["n"]]
            if spec["dtype"] == "bfloat16":
                arr = arr.view(ml_dtypes.bfloat16).astype(np.float32)
            node, parts = tree, key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = arr
    return tree, manifest["step"]


def latest_step(ckpt_dir):
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step

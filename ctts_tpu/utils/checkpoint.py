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


def latest_step(ckpt_dir):
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step

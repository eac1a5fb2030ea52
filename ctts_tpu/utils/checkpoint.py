"""Checkpointing: orbax save/restore with the reference's step-keyed layout.

Reference contract (train.py:190-200, utils/model.py:11-34): checkpoints
keyed by step under ckpt_path; resume restores model + optimizer and the LR
schedule recomputes from the restored step. Orbax gives atomic, async-able,
shard-aware saves — the TPU-native upgrade over torch.save of state_dicts.
"""

import os

import orbax.checkpoint as ocp


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


def latest_step(ckpt_dir):
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step

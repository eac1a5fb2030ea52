"""Optimizer: Adam + Noam warmup + step annealing (optax).

Schedule parity with the reference ScheduledOptim (model/optimizer.py:5-53):
lr = H^-0.5 · min(step^-0.5, step · warmup^-1.5) · anneal_rate^(#milestones
passed), Adam(β=0.9/0.98, eps=1e-9), global-norm gradient clipping.
"""

import jax.numpy as jnp
import optax


def noam_schedule(init_scale, warmup_steps, anneal_steps, anneal_rate):
    anneal = jnp.asarray(sorted(anneal_steps), jnp.float32)

    def schedule(count):
        step = jnp.maximum(count.astype(jnp.float32), 1.0)
        lr = init_scale * jnp.minimum(step ** -0.5,
                                      step * warmup_steps ** -1.5)
        n_passed = jnp.sum(step > anneal)
        return lr * anneal_rate ** n_passed

    return schedule


def build_optimizer(model_config, train_config, d_model=None):
    opt_cfg = train_config["optimizer"]
    if d_model is None:
        d_model = model_config["transformer"]["encoder_hidden"]
    schedule = noam_schedule(
        d_model ** -0.5, opt_cfg["warm_up_step"],
        opt_cfg["anneal_steps"], opt_cfg["anneal_rate"])
    tx = optax.chain(
        optax.clip_by_global_norm(opt_cfg["grad_clip_thresh"]),
        optax.adamw(schedule, b1=opt_cfg["betas"][0], b2=opt_cfg["betas"][1],
                    eps=opt_cfg["eps"],
                    weight_decay=opt_cfg.get("weight_decay", 0.0))
        if opt_cfg.get("weight_decay", 0.0) > 0 else
        optax.adam(schedule, b1=opt_cfg["betas"][0], b2=opt_cfg["betas"][1],
                   eps=opt_cfg["eps"]),
    )
    # gradient accumulation (reference grad_acc_step, train.py:68,112,118)
    acc = opt_cfg.get("grad_acc_step", 1)
    if acc and acc > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=acc)
    return tx, schedule

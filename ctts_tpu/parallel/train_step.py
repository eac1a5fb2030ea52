"""Jitted train/eval steps over a device mesh.

One compiled function per (mode, batch-bucket-shape); the schedule step is a
traced scalar inside the train state so schedule gates never retrace
(contrast: the reference re-runs Python branching per step,
train.py:93-210).
"""

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ctts_tpu.models.loss import compute_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(variables, tx):
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )


def make_train_step(model, tx, preprocess_config, model_config, train_config,
                    mode, donate=True):
    """Returns train_step(state, batch, dropout_rng) -> (state, metrics)."""

    def apply_model(params, batch_stats, batch, step, dropout_rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out, mutated = model.apply(
            variables,
            speakers=batch["speakers"], texts=batch["texts"],
            src_lens=batch["src_lens"], mode=mode,
            mels=batch["mels"], mel_lens=batch["mel_lens"],
            pitch_targets=batch["pitch_data"],
            energy_targets=batch["energies"],
            duration_targets=batch["durations"],
            attn_priors=batch["attn_priors"] if mode == "train_unsup" else None,
            spker_embeds=batch["spker_embeds"],
            step=step, deterministic=False,
            rngs={"dropout": dropout_rng,
                  "lsh": jax.random.fold_in(dropout_rng, 1)},
            mutable=["batch_stats"])
        return out, mutated.get("batch_stats", {})

    def train_step(state, batch, dropout_rng):
        step = state.step + 1
        rng = jax.random.fold_in(dropout_rng, step)

        def loss_fn(params):
            out, new_stats = apply_model(params, state.batch_stats, batch,
                                         step, rng)
            total, comps = compute_loss(batch, out, step, preprocess_config,
                                        model_config, train_config)
            return total, (comps, new_stats)

        (_, (comps, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=step, params=params,
                                  batch_stats=new_stats,
                                  opt_state=opt_state)
        comps["grad_norm"] = optax.global_norm(grads)
        return new_state, comps

    kwargs = {"donate_argnums": (0,)} if donate else {}
    return jax.jit(train_step, **kwargs)


def make_eval_step(model, preprocess_config, model_config, train_config,
                   mode):
    def eval_step(state, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out, _ = model.apply(
            variables,
            speakers=batch["speakers"], texts=batch["texts"],
            src_lens=batch["src_lens"], mode=mode,
            mels=batch["mels"], mel_lens=batch["mel_lens"],
            pitch_targets=batch["pitch_data"],
            energy_targets=batch["energies"],
            duration_targets=batch["durations"],
            attn_priors=batch["attn_priors"] if mode == "train_unsup" else None,
            spker_embeds=batch["spker_embeds"],
            step=state.step, deterministic=True,
            mutable=["batch_stats"])
        _, comps = compute_loss(batch, out, state.step, preprocess_config,
                                model_config, train_config, training=False)
        return comps, out

    return jax.jit(eval_step)

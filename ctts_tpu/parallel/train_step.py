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
from ctts_tpu.ops.attn_prior import beta_binomial_prior


def prep_batch(batch, preprocess_config, mode):
    """Input-pipeline tail that runs ON DEVICE inside the jitted step:

    - computes the beta-binomial alignment prior from (mel_lens, src_lens)
      when the loader didn't ship one (train.on_device_prior) — at batch 16
      that's 4.7 MB/step of host->device traffic that never needs to exist
      (ops/attn_prior.py; the reference ships the precomputed prior with
      every batch, dataset.py collate)
    - upcasts reduced-precision transfer arrays (train.transfer_dtype:
      float16 halves the remaining batch bytes; mel targets quantize at
      ~1e-3 absolute on log-mels, far below training noise)

    Safe to call eagerly (model.init) or traced (train/eval step).
    """
    batch = dict(batch)
    for k, v in batch.items():
        if k == "pitch_data" and isinstance(v, dict):
            batch[k] = {pk: (pv.astype(jnp.float32)
                             if hasattr(pv, "dtype") and pv.dtype == jnp.float16
                             else pv) for pk, pv in v.items()}
        elif hasattr(v, "dtype") and v.dtype == jnp.float16:
            batch[k] = v.astype(jnp.float32)
    if mode == "train_unsup" and batch.get("attn_priors") is None:
        scaling = (preprocess_config["preprocessing"].get("duration", {})
                   .get("beta_binomial_scaling_factor", 1.0))
        batch["attn_priors"] = beta_binomial_prior(
            batch["mel_lens"], batch["src_lens"],
            batch["mels"].shape[1], batch["texts"].shape[1],
            scaling=scaling)
    return batch


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
    """Returns jitted train_step(state, batch, dropout_rng) ->
    (state, metrics)."""
    fn = _make_train_step_fn(model, tx, preprocess_config, model_config,
                             train_config, mode)
    kwargs = {"donate_argnums": (0,)} if donate else {}
    return jax.jit(fn, **kwargs)


def make_cached_train_step(model, tx, preprocess_config, model_config,
                           train_config, mode, energy_on_src, mesh=None,
                           donate=True):
    """Device-cache variant: the jitted step takes (state, cache_arrays,
    idx, rng) plus static bucket dims and gathers its batch from the
    HBM-resident corpus in-graph (data/device_cache.py) — per-step H2D is
    the [B] index vector. One compiled graph per (T_s, T_m) bucket, same
    as the streaming path."""
    from ctts_tpu.data.device_cache import gather_batch
    from ctts_tpu.parallel.mesh import batch_sharding

    fn = _make_train_step_fn(model, tx, preprocess_config, model_config,
                             train_config, mode)
    spec = batch_sharding(mesh) if mesh is not None else None

    def step(state, arrays, idx, dropout_rng, T_s, T_m):
        batch = gather_batch(arrays, idx, T_s, T_m, energy_on_src)
        if spec is not None:
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, spec(x)),
                batch)
        return fn(state, batch, dropout_rng)

    kwargs = {"donate_argnums": (0,)} if donate else {}
    return jax.jit(step, static_argnums=(4, 5), **kwargs)


def _make_train_step_fn(model, tx, preprocess_config, model_config,
                        train_config, mode):
    """The raw (unjitted) step closure shared by both entry points."""

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
        batch = prep_batch(batch, preprocess_config, mode)
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

    return train_step


def make_eval_step(model, preprocess_config, model_config, train_config,
                   mode):
    def eval_step(state, batch):
        batch = prep_batch(batch, preprocess_config, mode)
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

"""Block-zoo sweep: every block_type runs through the full CompTransTTS in
train and infer modes with finite outputs and flowing gradients
(the reference's pluggability axis, model/CompTransTTS.py:19-32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_configs, synth_batch
from ctts_tpu.models.comp_trans_tts import CompTransTTS
from ctts_tpu.models.loss import compute_loss

BLOCKS = ["transformer_fs2", "transformer", "fastformer", "lstransformer",
          "conformer", "reformer"]


@pytest.mark.parametrize("block", BLOCKS)
def test_block_forward_and_grads(block):
    pre, mod, tr = tiny_configs(block_type=block)
    batch = synth_batch(T_s=12, T_m=40)
    model = CompTransTTS(pre, mod, tr)
    kwargs = dict(
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], mode="train_unsup",
        mels=batch["mels"], mel_lens=batch["mel_lens"],
        pitch_targets=batch["pitch_data"], energy_targets=batch["energies"],
        duration_targets=None, attn_priors=batch["attn_priors"],
        step=jnp.asarray(10), deterministic=True)
    rngs = {"params": jax.random.PRNGKey(0), "lsh": jax.random.PRNGKey(7)}
    variables = model.init(rngs, **kwargs)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, **{k: v for k, v in variables.items()
                                  if k != "params"}},
            mutable=["batch_stats"],
            rngs={"lsh": jax.random.PRNGKey(7)}, **kwargs)
        total, comps = compute_loss(batch, out, jnp.asarray(60001), pre, mod,
                                    tr)
        return total, out

    (total, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total)), (block, float(total))
    assert not np.any(np.isnan(np.asarray(out["mel_predictions"])))
    gsum = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gsum) and gsum > 0, block


@pytest.mark.parametrize("block", BLOCKS)
def test_block_infer(block):
    pre, mod, tr = tiny_configs(block_type=block)
    batch = synth_batch(T_s=12, T_m=40)
    model = CompTransTTS(pre, mod, tr)
    kwargs = dict(
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], mode="infer", max_mel_len=128,
        deterministic=True)
    rngs = {"params": jax.random.PRNGKey(0), "lsh": jax.random.PRNGKey(7)}
    variables = model.init(rngs, **kwargs)
    out, _ = model.apply(variables, mutable=["batch_stats"],
                         rngs={"lsh": jax.random.PRNGKey(7)}, **kwargs)
    assert out["postnet_mel_predictions"].shape == (2, 128, 80)
    assert not np.any(np.isnan(np.asarray(out["postnet_mel_predictions"])))


def test_conformer_attend_to_padding_optout():
    """`conformer.attend_to_padding: false` trains (finite loss, flowing
    grads) and changes the encoder's use of padded keys, while the default
    keeps the reference's legacy behavior (checkpoint parity)."""
    pre, mod, tr = tiny_configs(block_type="conformer")
    mod["conformer"]["attend_to_padding"] = False
    batch = synth_batch(T_s=12, T_m=40)
    model = CompTransTTS(pre, mod, tr)
    kwargs = dict(
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], mode="train_unsup",
        mels=batch["mels"], mel_lens=batch["mel_lens"],
        pitch_targets=batch["pitch_data"], energy_targets=batch["energies"],
        duration_targets=None, attn_priors=batch["attn_priors"],
        step=jnp.asarray(10), deterministic=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, **kwargs)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, **{k: v for k, v in variables.items()
                                  if k != "params"}},
            mutable=["batch_stats"], **kwargs)
        total, _ = compute_loss(batch, out, jnp.asarray(60001), pre, mod, tr)
        return total

    total, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(total))
    gsum = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gsum) and gsum > 0

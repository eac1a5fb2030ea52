"""Prosody modeling (du2021 GMM-MDN, liu2021 DelightfulTTS) and
multi-speaker paths through the full model."""

import jax
import jax.numpy as jnp
import numpy as np

from helpers import tiny_configs, synth_batch
from ctts_tpu.models.comp_trans_tts import CompTransTTS
from ctts_tpu.models.loss import compute_loss


def _run(pre, mod, tr, batch, mode, step=200001, spk=None):
    model = CompTransTTS(pre, mod, tr)
    kwargs = dict(
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], mode=mode,
        mels=batch["mels"], mel_lens=batch["mel_lens"],
        pitch_targets=batch["pitch_data"], energy_targets=batch["energies"],
        duration_targets=batch["durations"],
        attn_priors=batch["attn_priors"] if mode == "train_unsup" else None,
        spker_embeds=spk,
        step=jnp.asarray(step), deterministic=True,
        rng=jax.random.PRNGKey(3))
    if mode == "infer":
        kwargs.update(mels=None, mel_lens=None, pitch_targets=None,
                      energy_targets=None, duration_targets=None,
                      attn_priors=None, max_mel_len=96)
    variables = model.init({"params": jax.random.PRNGKey(0)}, **kwargs)
    out, _ = model.apply(variables, mutable=["batch_stats"], **kwargs)
    return model, variables, out, kwargs


def test_du2021_train_and_infer():
    # du2021 requires supervised durations (model.yaml comment + assert,
    # modules.py:832)
    pre, mod, tr = tiny_configs(learn_alignment=False, prosody="du2021",
                                pitch_type="frame",
                                energy_feature="frame_level")
    batch = synth_batch(sup=True)
    model, variables, out, kwargs = _run(pre, mod, tr, batch, "train_sup")
    w, sigma, mu, emb = out["prosody_info"]
    B, T_s = batch["texts"].shape
    G = mod["prosody_modeling"]["du2021"]["predictor_num_gaussians"]
    assert w.shape == (B, T_s, G)
    assert sigma.shape == mu.shape == (B, T_s, G, 64)   # 2 * d_model(32)
    assert emb.shape == (B, T_s, 64)
    assert not np.any(np.isnan(np.asarray(emb)))

    # prosody loss engages past the enable step
    total, comps = compute_loss(batch, out, jnp.asarray(200001), pre, mod,
                                tr)
    assert np.isfinite(float(comps["prosody"]))
    total0, comps0 = compute_loss(batch, out, jnp.asarray(10), pre, mod, tr)
    assert float(comps0["prosody"]) == 0.0

    # inference path samples from the MDN
    _, _, out_i, _ = _run(pre, mod, tr, batch, "infer")
    assert out_i["postnet_mel_predictions"].shape[1] == 96
    assert not np.any(np.isnan(np.asarray(out_i["postnet_mel_predictions"])))


def test_liu2021_train_and_infer():
    pre, mod, tr = tiny_configs(learn_alignment=False, prosody="liu2021",
                                pitch_type="frame",
                                energy_feature="frame_level")
    batch = synth_batch(sup=True)
    model, variables, out, kwargs = _run(pre, mod, tr, batch, "train_sup")
    up_tgt, pp_tgt, up_vec, pp_vec, pp_attn = out["prosody_info"]
    B, T_s = batch["texts"].shape
    assert up_tgt.shape == (B, 1, 16)     # bottleneck_size_u (tiny: 16)
    assert pp_tgt.shape == (B, T_s, 4)    # bottleneck_size_p
    assert up_vec.shape == (B, 1, 16)
    assert pp_vec.shape == (B, T_s, 4)
    total, comps = compute_loss(batch, out, jnp.asarray(200001), pre, mod,
                                tr)
    assert np.isfinite(float(comps["prosody"])) and \
        float(comps["prosody"]) > 0

    _, _, out_i, _ = _run(pre, mod, tr, batch, "infer")
    assert not np.any(np.isnan(np.asarray(out_i["postnet_mel_predictions"])))


def test_multi_speaker_embedding_table():
    pre, mod, tr = tiny_configs(multi_speaker=True)
    batch = synth_batch()
    model, variables, out, kwargs = _run(pre, mod, tr, batch, "train_unsup")
    assert "speaker_emb" in variables["params"]
    assert not np.any(np.isnan(np.asarray(out["mel_predictions"])))
    # different speaker id → different output
    kwargs2 = dict(kwargs, speakers=jnp.ones_like(batch["speakers"]))
    out2, _ = model.apply(variables, mutable=["batch_stats"], **kwargs2)
    assert np.abs(np.asarray(out["mel_predictions"])
                  - np.asarray(out2["mel_predictions"])).max() > 1e-6


def test_multi_speaker_external_embedder():
    pre, mod, tr = tiny_configs(multi_speaker=True)
    pre["preprocessing"]["speaker_embedder"] = "DeepSpeaker"
    mod["external_speaker_dim"] = 512
    batch = synth_batch()
    spk = jnp.asarray(np.random.RandomState(0).randn(2, 512).astype(
        np.float32))
    model, variables, out, kwargs = _run(pre, mod, tr, batch, "train_unsup",
                                         spk=spk)
    assert not np.any(np.isnan(np.asarray(out["mel_predictions"])))


def _train_steps(prosody, n_steps=30):
    """Run the PRODUCTION train_sup step with the prosody loss gate open
    from step 0 — regression-gates the path tools/prosody_validation.py
    drives on real speech (grad flow through extractor/encoders + MDN)."""
    from ctts_tpu.parallel.train_step import (create_train_state,
                                              make_train_step)
    from ctts_tpu.utils.optimizer import build_optimizer

    pre, mod, tr = tiny_configs(learn_alignment=False, prosody=prosody,
                                pitch_type="frame",
                                energy_feature="frame_level")
    tr["step"]["var_start_steps"] = 0
    tr["prosody"]["prosody_loss_enable_steps"] = 0
    batch = synth_batch(sup=True)
    db = {k: v for k, v in batch.items() if k not in ("ids", "raw_texts")}

    model = CompTransTTS(pre, mod, tr)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        speakers=db["speakers"], texts=db["texts"],
        src_lens=db["src_lens"], mode="train_sup", mels=db["mels"],
        mel_lens=db["mel_lens"], pitch_targets=db["pitch_data"],
        energy_targets=db["energies"],
        duration_targets=db["durations"],
        step=jnp.zeros((), jnp.int32), deterministic=True)
    tx, _ = build_optimizer(mod, tr)
    state = create_train_state(variables, tx)
    step_fn = make_train_step(model, tx, pre, mod, tr, "train_sup",
                              donate=False)
    hist = []
    for s in range(n_steps):
        state, metrics = step_fn(state, db, jax.random.PRNGKey(s))
        hist.append((float(metrics["total"]), float(metrics["prosody"]),
                     float(metrics["grad_norm"])))
    return hist


def test_du2021_trains_through_the_loop():
    hist = _train_steps("du2021")
    assert all(np.isfinite(t) and np.isfinite(g) for t, _, g in hist), hist
    # the MDN NLL component must move (grads reach the prosody stack) and
    # the total must improve while overfitting one tiny batch
    assert hist[-1][0] < hist[0][0], (hist[0], hist[-1])
    assert abs(hist[-1][1] - hist[0][1]) > 1e-5, (hist[0], hist[-1])


def test_liu2021_trains_through_the_loop():
    hist = _train_steps("liu2021")
    assert all(np.isfinite(t) and np.isfinite(g) for t, _, g in hist), hist
    assert hist[-1][0] < hist[0][0], (hist[0], hist[-1])
    # the prosody L1 chases a MOVING encoder target, so 30 steps need not
    # be monotone — require movement (grads reach the stack), not descent
    assert abs(hist[-1][1] - hist[0][1]) > 1e-5, (hist[0], hist[-1])

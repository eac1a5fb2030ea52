"""CompTransTTS loss — pure function, single jit graph for all schedules.

Port of the reference loss semantics (model/loss.py:10-386) with the
schedule gates (var_start_steps, binarization warmup, prosody enable)
expressed as arithmetic on the traced step so the train step compiles once:

* weighted-L1 mel loss with nonzero-target weights (loss.py:98-121)
* duration loss at phone (log-MSE), word (silence-segmented scatter-add) and
  sentence levels (loss.py:123-166)
* pitch loss per pitch_type: cwt (C/uv/f0_mean/f0_std), frame (f0+uv), ph
  (loss.py:168-229)
* energy L1 at the configured level (loss.py:231-240)
* ForwardSum CTC + binarization loss for unsupervised alignment
  (loss.py:306-313, 350-386)
* GMM-MDN NLL (du2021) / L1 prosody loss (liu2021) (loss.py:55-89, 316-324)
"""

import jax
import jax.numpy as jnp

from ctts_tpu.ops.forward_sum import bin_loss as _bin_loss
from ctts_tpu.ops.forward_sum import forward_sum_loss
from ctts_tpu.text import sil_phonemes_ids


def _masked_mean(x, mask_weight):
    denom = jnp.maximum(jnp.sum(mask_weight), 1.0)
    return jnp.sum(x * mask_weight) / denom


def weighted_mel_l1(pred, target, mel_pad_mask):
    """L1 weighted by nonzero-target frames (loss.py:98-121)."""
    pred = jnp.where(mel_pad_mask[..., None], 0.0, pred)
    target = jnp.where(mel_pad_mask[..., None], 0.0, target)
    weights = (jnp.sum(jnp.abs(target), axis=-1, keepdims=True) != 0
               ).astype(jnp.float32)
    l1 = jnp.abs(pred - target)
    return jnp.sum(l1 * weights) / jnp.maximum(
        jnp.sum(weights) * target.shape[-1], 1.0)


def duration_loss(log_dur_pred, dur_gt, txt_tokens, src_pad_mask, loss_cfg,
                  crf_ll=None):
    """Phone/word/sentence duration losses (loss.py:123-166).

    The reference's "mog"/"crf" branches raise NotImplementedError and
    its declared "huber" head has no loss branch at all (loss.py:138-152);
    here all of them work: "mog" is a 5-component MDN NLL over
    log(d+1) (head layout in predictors.mog_split), "crf" takes the
    in-model CRF log-likelihood (`crf_ll`, [B]; params live with the
    predictor as in the reference's commented-out call). The word/sentence
    terms always need a differentiable per-phone duration: the MDN uses
    its posterior mean, the CRF the per-position emission-softmax
    expectation (transition-free — a documented simplification).
    """
    nonpad = (~src_pad_mask).astype(jnp.float32)
    dur_gt = dur_gt.astype(jnp.float32) * nonpad
    sil_ids = sil_phonemes_ids()
    is_sil = jnp.zeros_like(txt_tokens, bool)
    for p_id in sil_ids:
        is_sil = is_sil | (txt_tokens == p_id)
    is_sil = is_sil.astype(jnp.float32)

    losses = {}
    kind = loss_cfg["dur_loss"]
    if kind == "mse":
        pdur = (log_dur_pred - jnp.log(dur_gt + 1.0)) ** 2
        losses["pdur"] = _masked_mean(pdur, nonpad)
        dur_pred = jnp.maximum(jnp.exp(log_dur_pred) - 1.0, 0.0)
    elif kind == "huber":
        # the reference declares this head (modules.py:1289) but its loss
        # has no branch for it (KeyError at runtime); torch SmoothL1
        # (delta=1) semantics on log-durations
        err = log_dur_pred - jnp.log(dur_gt + 1.0)
        a = jnp.abs(err)
        pdur = jnp.where(a < 1.0, 0.5 * err * err, a - 0.5)
        losses["pdur"] = _masked_mean(pdur, nonpad)
        dur_pred = jnp.maximum(jnp.exp(log_dur_pred) - 1.0, 0.0)
    elif kind == "mog":
        from ctts_tpu.models.predictors import mog_mean, mog_nll
        nll = mog_nll(log_dur_pred, jnp.log(dur_gt + 1.0))
        losses["pdur"] = _masked_mean(nll, nonpad)
        dur_pred = jnp.maximum(jnp.exp(mog_mean(log_dur_pred)) - 1.0, 0.0)
    elif kind == "crf":
        losses["pdur"] = -jnp.mean(crf_ll)           # reduction="mean"
        classes = jnp.arange(log_dur_pred.shape[-1], dtype=jnp.float32)
        dur_pred = jnp.sum(
            jax.nn.softmax(log_dur_pred, axis=-1) * classes, axis=-1)
    else:
        raise ValueError(f"unknown dur_loss {kind!r}")
    losses["pdur"] = losses["pdur"] * loss_cfg["lambda_ph_dur"]
    dur_pred = dur_pred * nonpad

    if loss_cfg["lambda_word_dur"] > 0:
        B, T = txt_tokens.shape
        word_id = (jnp.cumsum(is_sil, -1) * (1 - is_sil)).astype(jnp.int32)
        def wsum(vals, wid):
            return jnp.zeros(T + 1, jnp.float32).at[wid].add(vals)[1:]
        word_dur_p = jax.vmap(wsum)(dur_pred, word_id)
        word_dur_g = jax.vmap(wsum)(dur_gt, word_id)
        wdur = (jnp.log(word_dur_p + 1.0) - jnp.log(word_dur_g + 1.0)) ** 2
        word_nonpad = (word_dur_g > 0).astype(jnp.float32)
        losses["wdur"] = _masked_mean(wdur, word_nonpad) \
            * loss_cfg["lambda_word_dur"]
    if loss_cfg["lambda_sent_dur"] > 0:
        sdur = (jnp.log(dur_pred.sum(-1) + 1.0)
                - jnp.log(dur_gt.sum(-1) + 1.0)) ** 2
        losses["sdur"] = jnp.mean(sdur) * loss_cfg["lambda_sent_dur"]
    return losses


def _bce_logits(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels \
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def pitch_loss(pitch_predictions, pitch_targets, pitch_cfg, loss_cfg,
               src_pad_mask, mel_pad_mask):
    """(loss.py:168-229)"""
    losses = {}
    pitch_type = pitch_cfg["pitch_type"]
    lam_f0 = loss_cfg["lambda_f0"]
    p_fn = (jnp.abs if loss_cfg["pitch_loss"] == "l1"
            else lambda d: d ** 2)

    if pitch_type == "ph":
        nonpad = (~src_pad_mask).astype(jnp.float32)
        diff = p_fn(pitch_predictions["pitch_pred"][:, :, 0]
                    - pitch_targets["f0"])
        losses["f0"] = _masked_mean(diff, nonpad) * lam_f0
        return losses

    f0 = pitch_targets["f0"]
    uv = pitch_targets["uv"]
    nonpad = (~mel_pad_mask).astype(jnp.float32)
    if pitch_type == "cwt":
        cwt_pred = pitch_predictions["cwt"][:, :, :10]
        cwt_tgt = pitch_targets["cwt_spec"]
        if loss_cfg["cwt_loss"] == "ssim":
            from ctts_tpu.ops.ssim import ssim_loss as _ssim_loss
            losses["C"] = _ssim_loss(cwt_pred, cwt_tgt, bias=20.0) * lam_f0
        else:
            assert loss_cfg["cwt_loss"] in ("l1", "l2")
            c_fn = (jnp.abs if loss_cfg["cwt_loss"] == "l1"
                    else lambda d: d ** 2)
            losses["C"] = jnp.mean(c_fn(cwt_pred - cwt_tgt)) * lam_f0
        if pitch_cfg["use_uv"]:
            uv_pred = pitch_predictions["cwt"][:, :, -1]
            losses["uv"] = _masked_mean(_bce_logits(uv_pred, uv), nonpad) \
                * loss_cfg["lambda_uv"]
        losses["f0_mean"] = jnp.mean(jnp.abs(
            pitch_predictions["f0_mean"] - pitch_targets["f0_mean"])) * lam_f0
        losses["f0_std"] = jnp.mean(jnp.abs(
            pitch_predictions["f0_std"] - pitch_targets["f0_std"])) * lam_f0
    elif pitch_type == "frame":
        p_pred = pitch_predictions["pitch_pred"]
        if pitch_cfg["use_uv"]:
            losses["uv"] = _masked_mean(_bce_logits(p_pred[:, :, 1], uv),
                                        nonpad) * loss_cfg["lambda_uv"]
            nonpad = nonpad * (uv == 0).astype(jnp.float32)
        losses["f0"] = _masked_mean(p_fn(p_pred[:, :, 0] - f0), nonpad) \
            * lam_f0
    return losses


def energy_loss(pred, target, feature_level, src_pad_mask, mel_pad_mask):
    """Masked-select L1 (loss.py:231-240)."""
    mask = src_pad_mask if feature_level == "phoneme_level" else mel_pad_mask
    nonpad = (~mask).astype(jnp.float32)
    return _masked_mean(jnp.abs(pred - target), nonpad)


def mdn_loss(w, sigma, mu, target, src_pad_mask):
    """GMM-MDN negative log-likelihood (loss.py:55-79)."""
    target = jax.lax.stop_gradient(target)[:, :, None, :]
    sigma = jnp.maximum(sigma, 1e-6)
    logp = (-jnp.log(sigma) - 0.5 * jnp.log(2 * jnp.pi)
            - 0.5 * ((target - mu) / sigma) ** 2)
    logp = jnp.where(src_pad_mask[:, :, None, None], 0.0, logp)
    logp = jnp.sum(logp, axis=3)                        # [B, T, G]
    prob = jnp.log(jnp.clip(w, 1e-12, None)) + logp
    nll = -jax.nn.logsumexp(prob, axis=2)               # [B, T]
    nll = jnp.where(src_pad_mask, 0.0, nll)
    return jnp.mean(nll)


def compute_loss(inputs, predictions, step, preprocess_config, model_config,
                 train_config, training=True):
    """Returns (total_loss, dict of component losses).

    inputs: dict with texts, mels, pitch_data, energies, durations.
    predictions: model output dict. step: traced int scalar.
    """
    loss_cfg = train_config["loss"]
    pitch_cfg = preprocess_config["preprocessing"]["pitch"]
    learn_alignment = model_config["duration_modeling"]["learn_alignment"]
    use_pitch = model_config["variance_embedding"]["use_pitch_embed"]
    use_energy = model_config["variance_embedding"]["use_energy_embed"]
    energy_level = preprocess_config["preprocessing"]["energy"]["feature"]
    model_type = model_config["prosody_modeling"]["model_type"]
    step = jnp.asarray(step, jnp.int32)

    src_masks = predictions["src_masks"]                # True at padding
    mel_masks = predictions["mel_masks"]
    mel_targets = inputs["mels"][:, : mel_masks.shape[1], :]

    L = {}
    L["mel"] = weighted_mel_l1(predictions["mel_predictions"], mel_targets,
                               mel_masks)
    L["postnet_mel"] = weighted_mel_l1(
        predictions["postnet_mel_predictions"], mel_targets, mel_masks)

    # ---- alignment losses ----
    ctc = bin_l = jnp.zeros(())
    if learn_alignment:
        attn_soft, attn_hard, attn_hard_dur, attn_logprob = \
            predictions["attn_outs"]
        duration_targets = attn_hard_dur
        ctc = forward_sum_loss(attn_logprob, inputs["src_lens"],
                               inputs["mel_lens"])
        tc = train_config["duration"]
        w = jnp.clip((step - tc["binarization_loss_enable_steps"])
                     / tc["binarization_loss_warmup_steps"], 0.0, 1.0)
        bin_l = _bin_loss(attn_hard, attn_soft) * w
    else:
        duration_targets = inputs["durations"]
    L["ctc"] = ctc
    L["bin"] = bin_l

    # ---- prosody loss ----
    prosody = jnp.zeros(())
    if training and model_type != "none":
        gate = (step > train_config["prosody"]["prosody_loss_enable_steps"]
                ).astype(jnp.float32)
        info = predictions["prosody_info"]
        if model_type == "du2021":
            w_, sigma, mu, emb = info
            prosody = gate * train_config["prosody"]["gmm_mdn_beta"] \
                * mdn_loss(w_, sigma, mu, emb, src_masks)
        elif model_type == "liu2021":
            up_tgt, pp_tgt, up_vec, pp_vec, _ = info
            nonpad = (~src_masks)[..., None].astype(jnp.float32)
            pl = jnp.mean(jnp.abs(up_tgt - up_vec))
            pl = pl + _masked_mean(jnp.abs(pp_tgt - pp_vec),
                                   jnp.broadcast_to(nonpad, pp_tgt.shape))
            prosody = gate * pl
    L["prosody"] = prosody

    total = L["mel"] + L["postnet_mel"] + ctc + bin_l + prosody

    # ---- variance losses, gated by var_start_steps (loss.py:329-335) ----
    var_gate = (step > train_config["step"]["var_start_steps"]
                ).astype(jnp.float32)
    d_losses = duration_loss(predictions["log_duration_predictions"],
                             duration_targets, inputs["texts"], src_masks,
                             loss_cfg, crf_ll=predictions.get("dur_crf_ll"))
    for k, v in d_losses.items():
        L[k] = v * var_gate
        total = total + L[k]
    if use_pitch:
        p_losses = pitch_loss(predictions["pitch_predictions"],
                              predictions["pitch_targets"], pitch_cfg,
                              loss_cfg, src_masks, mel_masks)
        for k, v in p_losses.items():
            L["pitch_" + k] = v * var_gate
            total = total + L["pitch_" + k]
    if use_energy:
        e = energy_loss(predictions["energy_predictions"],
                        predictions["energy_targets"], energy_level,
                        src_masks, mel_masks)
        L["energy"] = e * var_gate
        total = total + L["energy"]

    L["total"] = total
    return total, L

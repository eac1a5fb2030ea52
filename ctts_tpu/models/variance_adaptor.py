"""Variance adaptor: duration/alignment + pitch + energy, fully on device.

Orchestration hub equivalent to the reference VarianceAdaptor
(model/modules.py:726-1114), re-designed for XLA:

* mode is a STATIC argument ("train_unsup" | "train_sup" | "infer") instead
  of the reference's None-probing, so each jit specialization traces exactly
  one branch;
* MAS binarization runs on device (ops/mas.py) instead of a numba CPU
  round-trip (model/modules.py:863-872);
* the LengthRegulator is a fixed-shape mel2ph gather (ops/length_regulator);
* phoneme-level pitch/energy averaging is a segment mean (ops/segment)
  instead of per-utterance numpy loops (model/modules.py:874-888);
* the soft-vs-hard upsampling schedule gate (step < binarization_start_steps,
  model/modules.py:1046-1053) is a lax.cond on the traced step so the whole
  train step compiles once.

Note: the reference drops its predictor-grad scaling for the energy
predictor by accident (no-op at model/modules.py:951); we apply the intended
scaling, as for pitch/duration.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctts_tpu.models.aligner import AlignmentEncoder
from ctts_tpu.models.predictors import (CwtStatsLayers, DurationCRF,
                                        DurationPredictor, EnergyPredictor,
                                        PitchPredictor, PitchPredictorAR,
                                        grad_scale, mog_mean)
from ctts_tpu.models.prosody import (DuProsodyExtractor, DuProsodyPredictor,
                                     LiuProsody)
from ctts_tpu.ops.cwt import cwt2f0_norm
from ctts_tpu.ops.length_regulator import dur_to_mel2ph, gather_by_mel2ph
from ctts_tpu.ops.masks import get_mask_from_lengths
from ctts_tpu.ops.mas import b_mas
from ctts_tpu.ops.pitch import denorm_f0, f0_to_coarse
from ctts_tpu.ops.segment import phoneme_mean_by_mel2ph


class VarianceAdaptor(nn.Module):
    preprocess_config: dict
    model_config: dict
    train_config: dict
    d_model: int

    def setup(self):
        mc, pc, tc = self.model_config, self.preprocess_config, self.train_config
        vp = mc["variance_predictor"]
        self.learn_alignment = mc["duration_modeling"]["learn_alignment"]
        self.binarization_start_steps = tc["duration"]["binarization_start_steps"]
        self.use_pitch_embed = mc["variance_embedding"]["use_pitch_embed"]
        self.use_energy_embed = mc["variance_embedding"]["use_energy_embed"]
        self.predictor_grad = vp["predictor_grad"]
        self.pitch_cfg = pc["preprocessing"]["pitch"]
        self.pitch_type = self.pitch_cfg["pitch_type"]
        self.pitch_ar = bool(self.pitch_cfg.get("pitch_ar", False))
        self.use_uv = self.pitch_cfg["use_uv"]
        self.energy_feature_level = pc["preprocessing"]["energy"]["feature"]
        self.model_type = mc["prosody_modeling"]["model_type"]
        hidden = self.d_model

        self.dur_loss_type = tc["loss"]["dur_loss"]
        self.duration_predictor = DurationPredictor(
            n_layers=vp["dur_predictor_layers"], n_chans=vp["filter_size"],
            kernel_size=vp["dur_predictor_kernel"],
            dropout_rate=vp["dropout"], padding=vp["ffn_padding"],
            dur_loss=self.dur_loss_type)
        if self.dur_loss_type == "crf":
            self.dur_crf = DurationCRF(num_tags=32)

        if self.use_pitch_embed:
            n_bins = mc["variance_embedding"]["pitch_n_bins"]
            if self.pitch_type == "cwt":
                self.cwt_std_scale = vp["cwt_std_scale"]
                h = vp["cwt_hidden_size"]
                cwt_out_dims = 11 if self.use_uv else 10
                self.cwt_in_proj = nn.Dense(h, name="cwt_in_proj")
                self.cwt_predictor = PitchPredictor(
                    odim=cwt_out_dims, n_layers=vp["predictor_layers"],
                    n_chans=vp["filter_size"], kernel_size=vp["predictor_kernel"],
                    dropout_rate=vp["dropout"], padding=vp["ffn_padding"],
                    name="cwt_predictor")
                self.cwt_stats_layers = CwtStatsLayers(hidden=h)
            elif self.pitch_ar:
                # intended semantics of the reference's broken pitch_ar
                # branch (modules.py:922-925) — see PitchPredictorAR
                if self.pitch_type != "frame":
                    raise ValueError(
                        "pitch_ar requires pitch_type 'frame' "
                        f"(got {self.pitch_type!r}); the reference only "
                        "reaches its pitch_ar branch for frame pitch")
                self.pitch_predictor = PitchPredictorAR(
                    odim=2,
                    n_layers=vp["predictor_layers"], n_chans=vp["filter_size"],
                    kernel_size=vp["predictor_kernel"],
                    dropout_rate=vp["dropout"], padding=vp["ffn_padding"])
            else:
                self.pitch_predictor = PitchPredictor(
                    odim=2 if self.pitch_type == "frame" else 1,
                    n_layers=vp["predictor_layers"], n_chans=vp["filter_size"],
                    kernel_size=vp["predictor_kernel"],
                    dropout_rate=vp["dropout"], padding=vp["ffn_padding"])
            self.pitch_embed = nn.Embed(
                n_bins, hidden,
                embedding_init=_zero_pad_normal_init(hidden),
                name="pitch_embed")

        if self.use_energy_embed:
            n_bins = mc["variance_embedding"]["energy_n_bins"]
            e_min, e_max = mc["_energy_stats"]
            if mc["variance_embedding"]["energy_quantization"] == "log":
                self.energy_bins = jnp.exp(jnp.linspace(
                    jnp.log(e_min), jnp.log(e_max), n_bins - 1))
            else:
                self.energy_bins = jnp.linspace(e_min, e_max, n_bins - 1)
            self.energy_predictor = EnergyPredictor(
                odim=1, n_layers=vp["predictor_layers"],
                n_chans=vp["filter_size"], kernel_size=vp["predictor_kernel"],
                dropout_rate=vp["dropout"], padding=vp["ffn_padding"])
            self.energy_embedding = nn.Embed(
                n_bins, hidden,
                embedding_init=_zero_pad_normal_init(hidden),
                name="energy_embedding")

        if self.learn_alignment:
            n_mel = pc["preprocessing"]["mel"]["n_mel_channels"]
            self.aligner = AlignmentEncoder(
                n_mel_channels=n_mel, n_att_channels=n_mel,
                n_text_channels=self.d_model,
                temperature=mc["duration_modeling"]["aligner_temperature"],
                multi_speaker=mc["multi_speaker"])

        if self.model_type == "du2021":
            du = mc["prosody_modeling"]["du2021"]
            n_mel = pc["preprocessing"]["mel"]["n_mel_channels"]
            self.prosody_extractor = DuProsodyExtractor(
                n_mel_channels=n_mel, d_model=self.d_model,
                kernel_size=du["extractor_kernel_size"])
            self.prosody_predictor = DuProsodyPredictor(
                d_model=self.d_model,
                kernel_sizes=tuple(du["predictor_kernel_size"]),
                num_gaussians=du["predictor_num_gaussians"],
                dropout=du["predictor_dropout"])
            self.prosody_linear = nn.Dense(
                self.d_model, use_bias=False,
                kernel_init=nn.initializers.xavier_uniform(),
                name="prosody_linear")
        elif self.model_type == "liu2021":
            self.liu_prosody = LiuProsody(self.preprocess_config,
                                          self.model_config)

    # ------------------------------------------------------------------ #

    def __call__(self, x, text_embedding, src_len, src_mask, mode,
                 mel=None, mel_len=None, mel_mask=None, max_mel_len=None,
                 pitch_target=None, energy_target=None, duration_target=None,
                 attn_prior=None, speaker_embedding=None,
                 p_control=1.0, e_control=1.0, d_control=1.0,
                 step=None, deterministic=True, rng=None):
        """mode: "train_unsup" | "train_sup" | "infer" (static).

        src_mask / mel_mask: True at padding. Returns a dict.
        """
        assert mode in ("train_unsup", "train_sup", "infer")
        training = mode != "infer"
        pitch_target = dict(pitch_target) if pitch_target else {}
        prosody_info = None

        x_text = x                          # pre-speaker encoder output
        if speaker_embedding is not None:
            x = x + speaker_embedding[:, None, :]

        # ---- prosody modeling (model/modules.py:990-1023) ----
        if self.model_type == "du2021":
            # the reference feeds the PRE-speaker text hidden to the
            # predictor (modules.py:992)
            w, sigma, mu = self.prosody_predictor(
                x_text, src_mask, deterministic=deterministic,
                training=training)
            if training:
                # BN mode follows `deterministic` (postnet convention):
                # batch stats while optimizing, running stats at eval
                prosody_embeddings = self.prosody_extractor(
                    mel, mel_len, duration_target, src_mask, max_mel_len,
                    training=not deterministic)
            else:
                prosody_embeddings = DuProsodyPredictor.sample(
                    w, sigma, mu, rng, src_mask)
            x = x + self.prosody_linear(prosody_embeddings)
            prosody_info = (w, sigma, mu, prosody_embeddings)
        elif self.model_type == "liu2021":
            x, prosody_info = self.liu_prosody(
                x, src_mask, mel, mel_mask, training=training,
                deterministic=deterministic)

        # ---- duration (model/modules.py:1025-1027) ----
        log_duration_prediction = self.duration_predictor(
            grad_scale(x, self.predictor_grad), src_mask,
            deterministic=deterministic)

        # ---- alignment (model/modules.py:1029-1042) ----
        attn_soft = attn_hard = attn_hard_dur = attn_logprob = None
        if mode == "train_unsup":
            assert attn_prior is not None and mel is not None
            attn_soft, attn_logprob = self.aligner(
                mel, text_embedding, src_mask, attn_prior, speaker_embedding)
            attn_hard = b_mas(attn_soft, src_len, mel_len)
            attn_hard_dur = jnp.sum(attn_hard, axis=1)          # [B, T_s]
        attn_out = (attn_soft, attn_hard, attn_hard_dur, attn_logprob)

        # ---- upsampling (model/modules.py:1044-1066) ----
        if mode == "train_unsup":
            max_len = max_mel_len
            mel2ph = dur_to_mel2ph(attn_hard_dur, src_mask, max_len=max_len)

            def soft_upsample(_):
                return jnp.einsum("bms,bsc->bmc",
                                  attn_soft.astype(x.dtype), x)

            def hard_upsample(_):
                return gather_by_mel2ph(x, mel2ph)

            x_up = jax.lax.cond(step < self.binarization_start_steps,
                                soft_upsample, hard_upsample, operand=None)
            duration_rounded = attn_hard_dur
            pitch_target["mel2ph"] = mel2ph
            out_mel_len, out_mel_mask = mel_len, mel_mask
        elif mode == "train_sup":
            max_len = max_mel_len
            mel2ph = (pitch_target.get("mel2ph") if pitch_target.get("mel2ph")
                      is not None else dur_to_mel2ph(duration_target, src_mask,
                                                     max_len=max_len))
            x_up = gather_by_mel2ph(x, mel2ph)
            duration_rounded = duration_target
            pitch_target["mel2ph"] = mel2ph
            out_mel_len, out_mel_mask = mel_len, mel_mask
        else:  # infer
            max_len = max_mel_len                    # static frame budget
            if self.dur_loss_type in ("mse", "huber"):
                log_dur = log_duration_prediction
            elif self.dur_loss_type == "mog":
                log_dur = mog_mean(log_duration_prediction)
            else:                                    # crf: Viterbi classes
                log_dur = jnp.log(1.0 + self.dur_crf.decode(
                    log_duration_prediction, ~src_mask).astype(jnp.float32))
            duration_rounded = jnp.maximum(
                jnp.round(jnp.exp(log_dur) - 1.0) * d_control, 0.0)
            duration_rounded = jnp.where(src_mask, 0.0, duration_rounded)
            mel2ph = dur_to_mel2ph(duration_rounded, src_mask, max_len=max_len)
            x_up = gather_by_mel2ph(x, mel2ph)
            out_mel_len = jnp.minimum(
                jnp.sum(duration_rounded.astype(jnp.int32), axis=1), max_len)
            out_mel_mask = get_mask_from_lengths(out_mel_len, max_len)

        # crf dur head: the CRF parameters live here (reference comment
        # `self.model.dur_predictor.crf(...)`, loss.py:147-148), so the
        # per-utterance log-likelihood is computed in-model and handed to
        # the loss; classes are durations clamped to [0, 31]
        dur_crf_ll = None
        if self.dur_loss_type == "crf" and mode != "infer":
            tags = jnp.clip(duration_rounded.astype(jnp.int32), 0, 31)
            dur_crf_ll = self.dur_crf.log_likelihood(
                log_duration_prediction, tags, ~src_mask)

        x_org = x                                      # token-level hidden
        x = x_up                                       # frame-level hidden

        # ---- pitch (model/modules.py:890-948, 1070-1091) ----
        pitch_predictions = None
        pitch_embedding = 0.0
        if self.use_pitch_embed:
            if training:
                if self.pitch_type == "cwt":
                    pitch_target["f0"] = cwt2f0_norm(
                        pitch_target["cwt_spec"], pitch_target["f0_mean"],
                        pitch_target["f0_std"], max_len, self.pitch_cfg)
                    pitch_target["f0_cwt"] = pitch_target["f0"]
                elif self.pitch_type == "ph":
                    pitch_target["f0"] = phoneme_mean_by_mel2ph(
                        pitch_target["f0"], mel2ph, x_org.shape[1])
                f0, uv = pitch_target["f0"], pitch_target.get("uv")
            else:
                f0 = uv = None
            pitch_predictions, pitch_embedding = self._pitch(
                x, x_org, f0, uv, mel2ph, p_control, deterministic,
                out_mel_mask if out_mel_mask is not None else
                get_mask_from_lengths(out_mel_len, max_len),
                src_mask)

        # ---- energy (model/modules.py:950-960, 1092-1099) ----
        energy_prediction = None
        energy_embedding = 0.0
        if self.use_energy_embed:
            frame_mask = (out_mel_mask if out_mel_mask is not None else
                          get_mask_from_lengths(out_mel_len, max_len))
            if self.energy_feature_level == "frame_level":
                tgt = energy_target if training else None
                energy_prediction, energy_embedding = self._energy(
                    x, tgt, e_control, deterministic, frame_mask)
            else:  # phoneme_level
                if mode == "train_unsup":
                    # no pre-extracted phone-level energy: average the frame
                    # energy by the MAS durations (model/modules.py:1096-1097)
                    energy_target = phoneme_mean_by_mel2ph(
                        energy_target, mel2ph, x_org.shape[1])
                tgt = energy_target if training else None
                energy_prediction, ph_embedding = self._energy(
                    x_org, tgt, e_control, deterministic, src_mask)
                energy_embedding = gather_by_mel2ph(ph_embedding, mel2ph)

        x = x + pitch_embedding + energy_embedding

        return {
            "x": x,
            "pitch_target": pitch_target if pitch_target else None,
            "pitch_predictions": pitch_predictions,
            "energy_target": energy_target,
            "energy_prediction": energy_prediction,
            "log_duration_prediction": log_duration_prediction,
            "dur_crf_ll": dur_crf_ll,
            "duration_rounded": duration_rounded,
            "mel_len": out_mel_len,
            "mel_mask": out_mel_mask,
            "mel2ph": mel2ph,
            "attn_out": attn_out,
            "prosody_info": prosody_info,
        }

    # ------------------------------------------------------------------ #

    def _pitch(self, decoder_inp, encoder_out, f0, uv, mel2ph, control,
               deterministic, frame_mask, src_mask):
        """get_pitch_embedding (model/modules.py:890-948)."""
        pitch_pred = f0_denorm = cwt = f0_mean = f0_std = None
        if self.pitch_type == "ph":
            inp = grad_scale(encoder_out, self.predictor_grad)
            pitch_pred = self.pitch_predictor(
                inp, src_mask, deterministic=deterministic) * control
            if f0 is None:
                f0 = pitch_pred[:, :, 0]
            f0_denorm = denorm_f0(f0, None, self.pitch_cfg)
            pitch = f0_to_coarse(f0_denorm)            # [B, T_s]
            pitch = jnp.where(src_mask, 0, pitch)
            frame_pitch = gather_by_mel2ph(pitch, mel2ph)
            pitch_embed = self.pitch_embed(frame_pitch)
        else:
            inp = grad_scale(decoder_inp, self.predictor_grad)
            pitch_padding = mel2ph == 0
            if self.pitch_type == "cwt":
                pitch_padding = None
                cwt = self.cwt_predictor(
                    self.cwt_in_proj(inp), frame_mask,
                    deterministic=deterministic) * control
                stats_out = self.cwt_stats_layers(encoder_out[:, 0, :])
                mean = f0_mean = stats_out[:, 0]
                std = f0_std = stats_out[:, 1]
                if f0 is None:                          # inference
                    std = std * self.cwt_std_scale
                    f0 = cwt2f0_norm(cwt[:, :, :10], mean, std,
                                     decoder_inp.shape[1], self.pitch_cfg)
                    if self.use_uv:
                        uv = (cwt[:, :, -1] > 0).astype(jnp.float32)
            elif self.pitch_ar:    # frame, autoregressive
                # teacher-forced on the target only in training, like the
                # reference's `f0 if self.training else None`
                # (modules.py:923)
                pitch_pred = self.pitch_predictor(
                    inp, frame_mask,
                    f0=None if deterministic else f0,
                    deterministic=deterministic) * control
                if f0 is None:
                    f0 = pitch_pred[:, :, 0]
                if self.use_uv and uv is None:
                    uv = (pitch_pred[:, :, 1] > 0).astype(jnp.float32)
            else:  # frame
                pitch_pred = self.pitch_predictor(
                    inp, frame_mask, deterministic=deterministic) * control
                if f0 is None:
                    f0 = pitch_pred[:, :, 0]
                if self.use_uv and uv is None:
                    uv = (pitch_pred[:, :, 1] > 0).astype(jnp.float32)
            f0_denorm = denorm_f0(f0, uv, self.pitch_cfg,
                                  pitch_padding=pitch_padding)
            # padded frames land in bin 1 (f0=0 via pitch_padding), NOT the
            # zero row — the reference does the same (modules.py:934-938),
            # and blocks that attend to padding (conformer) see that content
            pitch = f0_to_coarse(f0_denorm)
            pitch_embed = self.pitch_embed(pitch)

        predictions = {
            "pitch_pred": pitch_pred,
            "f0_denorm": f0_denorm,
            "cwt": cwt,
            "f0_mean": f0_mean,
            "f0_std": f0_std,
        }
        return predictions, pitch_embed

    def _energy(self, x, target, control, deterministic, mask):
        """get_energy_embedding (model/modules.py:950-960)."""
        inp = grad_scale(x, self.predictor_grad)
        prediction = self.energy_predictor(
            inp, mask, deterministic=deterministic)[..., 0]
        if target is not None:
            buckets = jnp.searchsorted(self.energy_bins, target, side="left")
        else:
            prediction = prediction * control
            buckets = jnp.searchsorted(self.energy_bins, prediction,
                                       side="left")
        return prediction, self.energy_embedding(buckets)


def _zero_pad_normal_init(features):
    def init(key, shape, dtype=jnp.float32):
        w = jax.random.normal(key, shape, dtype) * (features ** -0.5)
        return w.at[0].set(0.0)
    return init

"""CompTransTTS: encoder → (speaker) → variance adaptor → decoder → mel+postnet.

Top-level model, equivalent surface to the reference
(model/CompTransTTS.py:12-152) but functional: a flax module whose
``__call__`` takes a batch dict and a STATIC ``mode`` and returns a dict.
Model construction reads stats.json / speakers.json via
:func:`prepare_model_config` (the reference does this inside module
__init__, model/modules.py:787-819, CompTransTTS.py:43-62).
"""

import json
import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctts_tpu.models.postnet import PostNet
from ctts_tpu.models.registry import get_block, block_hidden
from ctts_tpu.models.variance_adaptor import VarianceAdaptor
from ctts_tpu.ops.masks import get_mask_from_lengths


def prepare_model_config(preprocess_config, model_config):
    """Inject dataset-derived constants (energy stats, speaker count) so the
    model itself stays pure. Returns an updated copy of model_config."""
    mc = dict(model_config)
    if mc["variance_embedding"]["use_energy_embed"]:
        learn_alignment = mc["duration_modeling"]["learn_alignment"]
        feature = preprocess_config["preprocessing"]["energy"]["feature"]
        # variance level resolution (reference utils/tools.py:30-44)
        tag = ("phone" if (not learn_alignment and feature == "phoneme_level")
               else "frame")
        dataset_tag = "unsup" if learn_alignment else "sup"
        stats_path = os.path.join(
            preprocess_config["path"]["preprocessed_path"], "stats.json")
        if os.path.exists(stats_path):
            with open(stats_path) as f:
                stats = json.load(f)
            e_min, e_max = stats[f"energy_{dataset_tag}_{tag}"][:2]
        else:  # no preprocessed data yet (tests, dry runs)
            e_min, e_max = -1.0, 9.0
        mc["_energy_stats"] = (float(e_min), float(e_max))
    if mc["multi_speaker"]:
        embedder = preprocess_config["preprocessing"].get(
            "speaker_embedder", "none")
        if embedder == "none":
            spk_path = os.path.join(
                preprocess_config["path"]["preprocessed_path"],
                "speakers.json")
            if os.path.exists(spk_path):
                with open(spk_path) as f:
                    mc["_n_speaker"] = len(json.load(f))
            else:
                mc["_n_speaker"] = 4
    return mc


class CompTransTTS(nn.Module):
    preprocess_config: dict
    model_config: dict
    train_config: dict

    def setup(self):
        mc = self.model_config
        TextEncoder, Decoder = get_block(mc["block_type"])
        enc_h, dec_h = block_hidden(mc)
        self.encoder = TextEncoder(mc)
        self.variance_adaptor = VarianceAdaptor(
            self.preprocess_config, mc, self.train_config, enc_h)
        self.decoder = Decoder(mc)
        self.mel_linear = nn.Dense(
            self.preprocess_config["preprocessing"]["mel"]["n_mel_channels"],
            param_dtype=jnp.float32, name="mel_linear")
        self.postnet = PostNet()

        self.embedder_type = None
        if mc["multi_speaker"]:
            self.embedder_type = self.preprocess_config["preprocessing"].get(
                "speaker_embedder", "none")
            if self.embedder_type == "none":
                self.speaker_emb = nn.Embed(mc["_n_speaker"], enc_h,
                                            name="speaker_emb")
            else:
                self.speaker_emb = nn.Dense(enc_h, name="speaker_emb")

    def __call__(self, speakers, texts, src_lens, mode,
                 mels=None, mel_lens=None,
                 pitch_targets=None, energy_targets=None,
                 duration_targets=None, attn_priors=None, spker_embeds=None,
                 p_control=1.0, e_control=1.0, d_control=1.0,
                 step=None, max_mel_len=None, deterministic=True, rng=None):
        """mode: "train_unsup" | "train_sup" | "infer" (static).

        Shapes are static: texts [B, T_s]; mels [B, T_m, n_mel] in training;
        at inference max_mel_len is the static frame budget.
        """
        if rng is None:
            rng = jax.random.PRNGKey(0)    # du2021 inference sampling
        max_src_len = texts.shape[1]
        src_masks = get_mask_from_lengths(src_lens, max_src_len)
        if mels is not None:
            max_mel_len = mels.shape[1]
            mel_masks = get_mask_from_lengths(mel_lens, max_mel_len)
        else:
            mel_masks = None

        output, text_embeds = self.encoder(texts, src_masks,
                                           deterministic=deterministic)

        speaker_embeds = None
        if self.embedder_type is not None:
            if self.embedder_type == "none":
                speaker_embeds = self.speaker_emb(speakers)
            else:
                assert spker_embeds is not None
                speaker_embeds = self.speaker_emb(spker_embeds)

        va = self.variance_adaptor(
            output, text_embeds, src_lens, src_masks, mode,
            mel=mels, mel_len=mel_lens, mel_mask=mel_masks,
            max_mel_len=max_mel_len,
            pitch_target=pitch_targets, energy_target=energy_targets,
            duration_target=duration_targets, attn_prior=attn_priors,
            speaker_embedding=speaker_embeds,
            p_control=p_control, e_control=e_control, d_control=d_control,
            step=step, deterministic=deterministic, rng=rng)

        dec_out, out_mel_masks = self.decoder(
            va["x"], va["mel_mask"], deterministic=deterministic)
        mel_pred = self.mel_linear(dec_out)
        postnet_out = self.postnet(mel_pred, training=not deterministic,
                                   deterministic=deterministic) + mel_pred

        return {
            "mel_predictions": mel_pred,
            "postnet_mel_predictions": postnet_out,
            "pitch_predictions": va["pitch_predictions"],
            "energy_predictions": va["energy_prediction"],
            "log_duration_predictions": va["log_duration_prediction"],
            "dur_crf_ll": va["dur_crf_ll"],
            "duration_rounded": va["duration_rounded"],
            "src_masks": src_masks,
            "mel_masks": out_mel_masks,
            "src_lens": src_lens,
            "mel_lens": va["mel_len"],
            "attn_outs": va["attn_out"],
            "prosody_info": va["prosody_info"],
            "pitch_targets": va["pitch_target"],
            "energy_targets": va["energy_target"],
            "mel2ph": va["mel2ph"],
        }

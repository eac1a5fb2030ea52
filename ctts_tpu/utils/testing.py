"""Shared test fixtures: tiny configs + synthetic batches."""

import copy

import numpy as np
import jax.numpy as jnp

from ctts_tpu.config import get_configs_of


def tiny_configs(block_type="transformer_fs2", pitch_type="cwt",
                 learn_alignment=True, energy_feature="phoneme_level",
                 prosody="none", multi_speaker=False):
    preprocess, model, train = get_configs_of("LJSpeech")
    preprocess = copy.deepcopy(preprocess)
    model = copy.deepcopy(model)
    train = copy.deepcopy(train)

    model["block_type"] = block_type
    model["compute_dtype"] = "float32"     # CPU tests
    # keep the legacy ship-the-prior loader path under test (production
    # configs default to on_device_prior; tests/test_attn_prior.py and
    # tests/test_real_speech.py cover the on-device path explicitly)
    train["on_device_prior"] = False
    train["transfer_dtype"] = "float32"
    model["duration_modeling"]["learn_alignment"] = learn_alignment
    model["prosody_modeling"]["model_type"] = prosody
    model["multi_speaker"] = multi_speaker
    model["max_seq_len"] = 64
    for key in ("transformer_fs2", "transformer", "fastformer",
                "lstransformer", "conformer"):
        if key in model:
            model[key]["encoder_hidden"] = 32
            model[key]["decoder_hidden"] = 32
            model[key]["encoder_layer"] = 1
            model[key]["decoder_layer"] = 1
            if key == "transformer":
                model[key]["conv_filter_size"] = 48
            if key == "conformer":
                model[key]["encoder_head"] = 2
                model[key]["decoder_head"] = 2
    model["reformer"]["depth"] = 1
    model["reformer"]["encoder_head"] = 2
    model["reformer"]["decoder_head"] = 2
    model["reformer"]["bucket_size"] = 8
    model["variance_predictor"]["filter_size"] = 32
    model["variance_predictor"]["cwt_hidden_size"] = 16
    model["prosody_modeling"]["liu2021"]["ref_enc_filters"] = [4, 4, 8]
    model["prosody_modeling"]["liu2021"]["ref_enc_gru_size"] = 8
    model["prosody_modeling"]["liu2021"]["token_num"] = 4
    model["prosody_modeling"]["liu2021"]["bottleneck_size_u"] = 16
    model["prosody_modeling"]["du2021"]["predictor_num_gaussians"] = 3
    model["_energy_stats"] = (-1.5, 8.5)
    model["_n_speaker"] = 4

    preprocess["preprocessing"]["pitch"]["pitch_type"] = pitch_type
    preprocess["preprocessing"]["energy"]["feature"] = energy_feature
    if multi_speaker:
        preprocess["preprocessing"]["speaker_embedder"] = "none"
    return preprocess, model, train


def synth_batch(B=2, T_s=11, T_m=40, n_mel=80, pitch_type="cwt", seed=0,
                sup=False):
    rng = np.random.RandomState(seed)
    src_lens = np.array([T_s] + [T_s - 3] * (B - 1))
    mel_lens = np.array([T_m] + [T_m - 7] * (B - 1))
    texts = np.zeros((B, T_s), np.int32)
    for b, L in enumerate(src_lens):
        texts[b, :L] = rng.randint(1, 300, size=L)
    mels = rng.randn(B, T_m, n_mel).astype(np.float32) * 0.1 - 4.0
    for b, L in enumerate(mel_lens):
        mels[b, L:] = 0.0
    f0 = np.abs(rng.randn(B, T_m).astype(np.float32)) * 0.3 + 7.0
    uv = (rng.rand(B, T_m) < 0.2).astype(np.float32)
    for b, L in enumerate(mel_lens):
        f0[b, L:] = 0.0
        uv[b, L:] = 0.0
    pitch_data = {"f0": jnp.asarray(f0), "uv": jnp.asarray(uv)}
    if pitch_type == "cwt":
        pitch_data["cwt_spec"] = jnp.asarray(
            rng.randn(B, T_m, 10).astype(np.float32))
        pitch_data["f0_mean"] = jnp.asarray(
            rng.rand(B).astype(np.float32) * 2 + 5)
        pitch_data["f0_std"] = jnp.asarray(
            rng.rand(B).astype(np.float32) * 0.5 + 0.1)
    energies = rng.randn(B, T_m).astype(np.float32) + 3.0
    for b, L in enumerate(mel_lens):
        energies[b, L:] = 0.0
    attn_priors = rng.rand(B, T_m, T_s).astype(np.float32) + 1e-3

    durations = None
    mel2ph = None
    if sup:
        durations = np.zeros((B, T_s), np.int64)
        for b in range(B):
            L, M = src_lens[b], mel_lens[b]
            d = rng.multinomial(M - L, np.ones(L) / L) + 1
            durations[b, :L] = d
        from ctts_tpu.ops.length_regulator import dur_to_mel2ph
        from ctts_tpu.ops.masks import get_mask_from_lengths
        mel2ph = dur_to_mel2ph(
            jnp.asarray(durations),
            get_mask_from_lengths(jnp.asarray(src_lens), T_s), max_len=T_m)
        pitch_data["mel2ph"] = mel2ph
        # sup phoneme-level energies are stored at phone level
    return {
        "speakers": jnp.zeros(B, jnp.int32),
        "texts": jnp.asarray(texts),
        "src_lens": jnp.asarray(src_lens),
        "mels": jnp.asarray(mels),
        "mel_lens": jnp.asarray(mel_lens),
        "pitch_data": pitch_data,
        "energies": jnp.asarray(energies),
        "durations": jnp.asarray(durations) if durations is not None else None,
        "attn_priors": jnp.asarray(attn_priors),
        "spker_embeds": None,
    }

"""Model/vocoder factory helpers (reference surface: utils/model.py:11-92)."""

import os

import jax
import jax.numpy as jnp
import numpy as np


def get_model(args_restore_step, configs, train=False, packed_ckpt=None):
    """Build CompTransTTS (+optimizer when train=True) and restore weights.
    Returns (model, state_or_variables).

    packed_ckpt: path to a bf16 npz produced by tools/pack_ckpt.py (e.g. the
    committed assets/ljdemo_ckpt.npz) — loads params/batch_stats without an
    orbax directory, so a fresh clone can synthesize with trained weights."""
    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)
    from ctts_tpu.parallel.train_step import create_train_state
    from ctts_tpu.utils.checkpoint import restore_checkpoint
    from ctts_tpu.utils.optimizer import build_optimizer
    from ctts_tpu.models.registry import block_hidden

    preprocess_config, model_config, train_config = configs
    model_config = prepare_model_config(preprocess_config, model_config)
    model = CompTransTTS(preprocess_config, model_config, train_config)

    # template init on tiny shapes IN TRAINING MODE so every submodule
    # (aligner, prosody encoders) materializes params — the checkpoint tree
    # always has the full structure regardless of the restore context
    B, T_s, T_m = 1, 16, 64
    learn_alignment = model_config["duration_modeling"]["learn_alignment"]
    mode = "train_unsup" if learn_alignment else "train_sup"
    pitch_type = preprocess_config["preprocessing"]["pitch"]["pitch_type"]
    pitch_targets = {
        "f0": jnp.full((B, T_m), 7.0), "uv": jnp.zeros((B, T_m)),
    }
    if pitch_type == "cwt":
        pitch_targets.update(
            cwt_spec=jnp.zeros((B, T_m, 10)),
            f0_mean=jnp.full((B,), 5.0), f0_std=jnp.full((B,), 0.2))
    durations = None
    attn_priors = None
    if learn_alignment:
        attn_priors = jnp.full((B, T_m, T_s), 1.0 / T_s)
    else:
        durations = jnp.full((B, T_s), T_m // T_s, jnp.int32)
        pitch_targets["mel2ph"] = jnp.repeat(
            jnp.arange(1, T_s + 1)[None], T_m // T_s, axis=1)[:, :T_m]
    kwargs = dict(
        speakers=jnp.zeros((B,), jnp.int32),
        texts=jnp.ones((B, T_s), jnp.int32),
        src_lens=jnp.full((B,), T_s, jnp.int32),
        mode=mode, mels=jnp.zeros((B, T_m, preprocess_config[
            "preprocessing"]["mel"]["n_mel_channels"])),
        mel_lens=jnp.full((B,), T_m, jnp.int32),
        pitch_targets=pitch_targets,
        energy_targets=jnp.zeros(
            (B, T_s if (not learn_alignment and preprocess_config[
                "preprocessing"]["energy"]["feature"] == "phoneme_level")
             else T_m)),
        duration_targets=durations, attn_priors=attn_priors,
        step=jnp.zeros((), jnp.int32), deterministic=True)
    if model_config["multi_speaker"] and \
            preprocess_config["preprocessing"].get(
                "speaker_embedder", "none") != "none":
        kwargs["spker_embeds"] = jnp.zeros(
            (B, model_config["external_speaker_dim"]), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "lsh": jax.random.PRNGKey(1)}
    if args_restore_step or packed_ckpt:
        # restoring: only the tree structure/shapes are needed — eval_shape
        # skips compiling the training graph
        variables = jax.eval_shape(lambda: model.init(rngs, **kwargs))
        variables = jax.tree.map(
            lambda a: jnp.zeros(a.shape, a.dtype), variables)
    else:
        variables = model.init(rngs, **kwargs)

    enc_h, _ = block_hidden(model_config)
    tx, _ = build_optimizer(model_config, train_config, d_model=enc_h)
    state = create_train_state(variables, tx)
    if packed_ckpt:
        from ctts_tpu.utils.checkpoint import load_params_npz
        if args_restore_step:
            raise ValueError(
                "--restore_step and --packed_ckpt both given: they select "
                "different weights (orbax dir vs packed npz) — pass one")
        tree, step = load_params_npz(packed_ckpt)
        state = state.replace(
            params=jax.device_put(tree["params"]),
            batch_stats=jax.device_put(tree.get("batch_stats") or {}))
        print(f"loaded packed weights (step {step}) from {packed_ckpt}")
    elif args_restore_step:
        state, _ = restore_checkpoint(
            train_config["path"]["ckpt_path"], state, args_restore_step)
    if train:
        return model, state, tx
    return model, {"params": state.params, "batch_stats": state.batch_stats}


def get_vocoder(model_config, ckpt_dir="ckpt"):
    """Load the configured vocoder (HiFi-GAN / MelGAN). Weights are external
    downloads like the reference (utils/model.py:57-69); without a weight
    file a griffin-lim fallback is returned."""
    from ctts_tpu.vocoder.hifigan import (HiFiGANGenerator, V1_CONFIG,
                                          load_torch_generator)
    name = model_config["vocoder"]["model"]
    speaker = model_config["vocoder"]["speaker"]
    if name == "HiFi-GAN":
        path = os.path.join(ckpt_dir, "hifigan",
                            f"generator_{speaker}.pth.tar")
        model = HiFiGANGenerator(dict(V1_CONFIG), dtype=jnp.bfloat16)
        if os.path.exists(path):
            variables, _ = load_torch_generator(path)
            return ("HiFi-GAN", model, variables)
        return ("griffin_lim", None, None)
    if name == "MelGAN":
        from ctts_tpu.vocoder.melgan import MelGANGenerator, load_torch_melgan
        path = os.path.join(ckpt_dir, "melgan", f"melgan_{speaker}.pt")
        model = MelGANGenerator(dtype=jnp.bfloat16)
        if os.path.exists(path):
            return ("MelGAN", model, load_torch_melgan(path))
        return ("griffin_lim", None, None)
    raise ValueError(f"unknown vocoder {name}")


# one jitted apply per live vocoder module: eager model.apply dispatches
# the generator op-by-op (measured ~100x slower through the TPU tunnel);
# the strong reference in the value keeps the id() key valid
_VOCODER_JIT = {}


def _jit_vocoder_apply(model):
    import jax
    key = id(model)
    hit = _VOCODER_JIT.get(key)
    if hit is None or hit[0] is not model:
        hit = (model, jax.jit(model.apply))
        _VOCODER_JIT[key] = hit
    return hit[1]


def vocoder_infer(mels, vocoder_tuple, preprocess_config, lengths=None):
    """mels [B, T, n_mel] (log) → list of int16 wavs
    (reference utils/model.py:74-92)."""
    name, model, variables = vocoder_tuple
    max_wav_value = preprocess_config["preprocessing"]["audio"]["max_wav_value"]
    hop = preprocess_config["preprocessing"]["stft"]["hop_length"]
    if name == "HiFi-GAN":
        wavs = np.asarray(_jit_vocoder_apply(model)(variables,
                                                    jnp.asarray(mels)))
    elif name == "MelGAN":
        wavs = np.asarray(_jit_vocoder_apply(model)(
            variables, jnp.asarray(mels) / np.log(10)))
    else:  # griffin-lim from approximate mel inversion
        from ctts_tpu.audio.tools import inv_mel_spec_batch
        wavs = inv_mel_spec_batch(np.asarray(mels), preprocess_config)
    wavs = (wavs * max_wav_value).clip(-max_wav_value,
                                       max_wav_value - 1).astype(np.int16)
    out = []
    for i in range(len(wavs)):
        n = int(lengths[i]) * hop if lengths is not None else wavs.shape[1]
        out.append(wavs[i, :n])
    return out


# one chunked-vocoder closure per (vocoder, chunk geometry): see
# _VOCODER_JIT above for why a per-call jit wrapper is catastrophic here
_STREAM_JIT = {}


def vocoder_stream(mels, vocoder_tuple, preprocess_config, chunk=64):
    """Chunked streaming variant of vocoder_infer: yields int16 wav chunks
    [B, chunk*hop] as they come off the device, so audio playback (or a
    network response) can start after ~one window instead of after the full
    utterance (ctts_tpu/vocoder/streaming.py; exact vs the full pass up to
    float reassociation). Concatenate the chunks and trim each row to
    `lengths[i]*hop` to recover vocoder_infer's output (any T works; the
    last chunk is shorter when T is not a chunk multiple). The reference
    has no streaming path (it vocodes full utterances, utils/model.py:74-92).
    """
    from ctts_tpu.vocoder.streaming import (make_chunked_vocoder, RF_MEL,
                                            RF_MEL_MELGAN)
    name, model, variables = vocoder_tuple
    max_wav_value = preprocess_config["preprocessing"]["audio"]["max_wav_value"]
    hop = preprocess_config["preprocessing"]["stft"]["hop_length"]
    mels = np.asarray(mels)
    if name == "HiFi-GAN":
        halo = RF_MEL
    elif name == "MelGAN":
        halo = RF_MEL_MELGAN
        mels = mels / np.log(10)
    else:
        raise ValueError(f"vocoder {name!r} has no streaming path "
                         "(griffin-lim is host-side and non-causal)")
    # memoize the chunked vocoder across calls: make_chunked_vocoder wraps
    # a FRESH @jax.jit, and a new jit wrapper per request means a full
    # re-trace through the remote-compile tunnel every time (measured
    # ~5.3 s added to time-to-first-audio on the serving loadtest); the
    # strong refs in the value keep the id() keys valid
    key = (id(model), id(variables), chunk, halo, hop)
    hit = _STREAM_JIT.get(key)
    if hit is None or hit[0] is not model or hit[1] is not variables:
        stream = make_chunked_vocoder(model.apply, variables, chunk=chunk,
                                      halo=halo, hop=hop)
        _STREAM_JIT[key] = hit = (model, variables, stream)
    stream = hit[2]
    # host numpy in, host numpy chunks out: the stream slices windows on
    # host and runs one jitted vocode+crop per chunk (no eager device ops)
    for wav in stream(mels):
        yield (wav * max_wav_value).clip(
            -max_wav_value, max_wav_value - 1).astype(np.int16)

"""Audio helpers: mel→wav griffin-lim inversion, featurize wav files
(reference surface: audio/tools.py, audio/audio_processing.py)."""

import numpy as np
import jax.numpy as jnp


def get_mel_from_wav(audio, stft):
    """wav [T] in [-1,1] → (log-mel [n_mel, F], energy [F])
    (reference audio/tools.py:8-15)."""
    audio = np.clip(audio, -1, 1)
    return stft.mel_spectrogram(audio)


def inv_mel_spec_batch(mels, preprocess_config, n_iters=30):
    """Approximate mel→wav via pseudo-inverse filterbank + griffin-lim.
    mels: [B, T, n_mel] log-compressed. Returns [B, T·hop] float32."""
    from ctts_tpu.audio.stft import (dynamic_range_decompression,
                                     griffin_lim_jnp, mel_filterbank)
    p = preprocess_config["preprocessing"]
    n_fft = p["stft"]["filter_length"]
    hop = p["stft"]["hop_length"]
    win = p["stft"]["win_length"]
    fb = mel_filterbank(p["audio"]["sampling_rate"], n_fft,
                        p["mel"]["n_mel_channels"], p["mel"]["mel_fmin"],
                        p["mel"]["mel_fmax"])
    inv_fb = np.linalg.pinv(fb)                # [n_bins, n_mel]
    mel_lin = dynamic_range_decompression(np.asarray(mels))
    mags = np.maximum(np.einsum("km,btm->btk", inv_fb, mel_lin), 1e-8)
    wav = griffin_lim_jnp(jnp.asarray(mags).transpose(0, 2, 1), n_fft, hop,
                          win, n_iters=n_iters)
    out = np.asarray(wav, np.float32)
    peak = np.abs(out).max(axis=1, keepdims=True)
    return out / np.maximum(peak, 1e-5) * 0.95

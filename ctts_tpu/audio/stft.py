"""Mel-spectrogram featurization (FFT-based, numpy + jnp twins).

Equivalent to the reference TacotronSTFT (audio/stft.py:22-185): hann-windowed
STFT with reflect padding of n_fft/2 (so n_frames = 1 + len//hop), slaney
mel filterbank (librosa.filters.mel semantics, re-implemented — librosa is
not a dependency), log dynamic-range compression log(clamp(x, 1e-5)), and
per-frame energy = L2 norm of linear magnitudes (audio/stft.py:183).

The numpy path serves the offline preprocessor; `mel_spectrogram_jnp` is the
jit-able twin for on-device featurization (e.g. fused eval pipelines).
"""

import numpy as np
import jax.numpy as jnp


# ---- slaney mel scale + filterbank (librosa.filters.mel parity) -------- #

_F_SP = 200.0 / 3
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(f):
    f = np.asarray(f, np.float64)
    mel = f / _F_SP
    return np.where(f >= _MIN_LOG_HZ,
                    _MIN_LOG_MEL + np.log(np.maximum(f, 1e-10) / _MIN_LOG_HZ)
                    / _LOGSTEP, mel)


def mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f = _F_SP * m
    return np.where(m >= _MIN_LOG_MEL,
                    _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)), f)


def mel_filterbank(sampling_rate, n_fft, n_mels, fmin, fmax=None):
    """[n_mels, 1 + n_fft//2] slaney-normalized triangular filterbank."""
    if fmax is None:
        fmax = sampling_rate / 2.0
    fftfreqs = np.linspace(0, sampling_rate / 2.0, 1 + n_fft // 2)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax),
                                    n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2: n_mels + 2] - mel_pts[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


def hann_window(win_length, n_fft):
    """Periodic hann, zero-centered-padded to n_fft (scipy get_window +
    librosa pad_center semantics)."""
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win_length) / win_length)
    pad = (n_fft - win_length) // 2
    return np.pad(w, (pad, n_fft - win_length - pad)).astype(np.float32)


# ---- numpy featurizer (offline) ---------------------------------------- #

class TacotronSTFT:
    def __init__(self, filter_length, hop_length, win_length, n_mel_channels,
                 sampling_rate, mel_fmin, mel_fmax):
        self.n_fft = filter_length
        self.hop = hop_length
        self.window = hann_window(win_length, filter_length)
        self.mel_basis = mel_filterbank(sampling_rate, filter_length,
                                        n_mel_channels, mel_fmin, mel_fmax)

    def magnitudes(self, y):
        """y: [T] in [-1, 1] → |STFT| [1 + n_fft//2, n_frames]."""
        pad = self.n_fft // 2
        y = np.pad(np.asarray(y, np.float32), (pad, pad), mode="reflect")
        n_frames = 1 + (len(y) - self.n_fft) // self.hop
        idx = (np.arange(self.n_fft)[None, :]
               + self.hop * np.arange(n_frames)[:, None])
        frames = y[idx] * self.window[None, :]
        spec = np.fft.rfft(frames, axis=1)
        return np.abs(spec).T.astype(np.float32)

    def mel_spectrogram(self, y):
        """y: [T] in [-1, 1] → (log-mel [n_mel, n_frames], energy [n_frames])
        (audio/stft.py:166-185)."""
        assert np.min(y) >= -1 and np.max(y) <= 1
        mag = self.magnitudes(y)
        mel = self.mel_basis @ mag
        mel = dynamic_range_compression(mel)
        energy = np.linalg.norm(mag, axis=0)
        return mel, energy.astype(np.float32)


def dynamic_range_compression(x, C=1, clip_val=1e-5):
    return np.log(np.clip(x, clip_val, None) * C)


def dynamic_range_decompression(x, C=1):
    return np.exp(x) / C


# ---- jnp twin (on-device) ---------------------------------------------- #

def mel_spectrogram_jnp(y, n_fft, hop, win_length, mel_basis):
    """Batched on-device featurizer: y [B, T] → (log-mel [B, F, n_mel],
    energy [B, F])."""
    pad = n_fft // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    B, T = y.shape
    n_frames = 1 + (T - n_fft) // hop
    idx = (jnp.arange(n_fft)[None, :] + hop * jnp.arange(n_frames)[:, None])
    frames = y[:, idx] * jnp.asarray(hann_window(win_length, n_fft))[None, None]
    spec = jnp.fft.rfft(frames, axis=-1)
    mag = jnp.abs(spec)                                   # [B, F, bins]
    mel = jnp.einsum("bfk,mk->bfm", mag, jnp.asarray(mel_basis))
    mel = jnp.log(jnp.clip(mel, 1e-5, None))
    energy = jnp.linalg.norm(mag, axis=-1)
    return mel, energy


def griffin_lim_jnp(magnitudes, n_fft, hop, win_length, n_iters=30, key=None):
    """Griffin-Lim phase reconstruction (audio/audio_processing.py:66-82),
    jit-able."""
    import jax
    B, bins, F = magnitudes.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    angles = jax.random.uniform(key, (B, F, bins)) * 2 * jnp.pi
    window = jnp.asarray(hann_window(win_length, n_fft))
    mag = jnp.swapaxes(magnitudes, 1, 2)                  # [B, F, bins]

    def istft(spec):
        frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window
        T = (F - 1) * hop + n_fft
        out = jnp.zeros((B, T))
        wsum = jnp.zeros((T,))
        idx = (jnp.arange(n_fft)[None, :] + hop * jnp.arange(F)[:, None])
        out = out.at[:, idx].add(frames)
        wsum = wsum.at[idx].add(window ** 2)
        out = out / jnp.maximum(wsum, 1e-8)[None]
        return out[:, n_fft // 2: T - n_fft // 2]

    def stft(y):
        pad = n_fft // 2
        yp = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
        idx = (jnp.arange(n_fft)[None, :] + hop * jnp.arange(F)[:, None])
        return jnp.fft.rfft(yp[:, idx] * window[None, None], axis=-1)

    def body(_, angles):
        signal = istft(mag * jnp.exp(1j * angles))
        new = stft(signal)
        return jnp.angle(new)

    angles = jax.lax.fori_loop(0, n_iters, body, angles)
    return istft(mag * jnp.exp(1j * angles))

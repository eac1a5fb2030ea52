"""Offline (numpy) pitch utilities for the preprocessor and data loader.

Numpy twins of the jnp pitch math (ops/pitch.py) plus:
* continuous-f0 interpolation (reference utils/pitch_tools.py:152-190)
* CWT decomposition of log-f0 (utils/pitch_tools.py:229-255)
* a self-contained autocorrelation (YIN-flavored) f0 tracker standing in for
  parselmouth's to_pitch_ac (utils/pitch_tools.py:85-132) since praat
  bindings aren't available; same frame rate and padding contract.
"""

import numpy as np
from scipy.interpolate import interp1d

from ctts_tpu.ops.cwt import get_lf0_cwt, norm_scale  # noqa: F401 (re-export)

F0_BIN = 256
F0_MAX = 1100.0
F0_MIN = 50.0
_F0_MEL_MIN = 1127 * np.log(1 + F0_MIN / 700)
_F0_MEL_MAX = 1127 * np.log(1 + F0_MAX / 700)


def f0_to_coarse_np(f0):
    f0_mel = 1127 * np.log(1 + f0 / 700)
    f0_mel[f0_mel > 0] = (f0_mel[f0_mel > 0] - _F0_MEL_MIN) * (F0_BIN - 2) \
        / (_F0_MEL_MAX - _F0_MEL_MIN) + 1
    f0_mel[f0_mel <= 1] = 1
    f0_mel[f0_mel > F0_BIN - 1] = F0_BIN - 1
    f0_coarse = np.rint(f0_mel).astype(np.int64)
    assert f0_coarse.max() <= 255 and f0_coarse.min() >= 1
    return f0_coarse


def norm_f0_np(f0, uv, pitch_config):
    if pitch_config["pitch_norm"] == "standard":
        f0 = (f0 - pitch_config["f0_mean"]) / pitch_config["f0_std"]
    elif pitch_config["pitch_norm"] == "log":
        f0 = np.log2(f0 + pitch_config["pitch_norm_eps"])
    if uv is not None and pitch_config["use_uv"]:
        f0[uv > 0] = 0
    return f0


def norm_interp_f0(f0, pitch_config):
    """Normalize + linearly interpolate through unvoiced regions
    (utils/pitch_tools.py:51-66). Returns (f0, uv)."""
    f0 = np.asarray(f0, np.float32).copy()
    uv = f0 == 0
    f0 = norm_f0_np(f0, uv, pitch_config)
    if uv.sum() == len(f0):
        f0[uv] = 0
    elif uv.sum() > 0:
        f0[uv] = np.interp(np.where(uv)[0], np.where(~uv)[0], f0[~uv])
    return f0, uv.astype(np.float32)


def convert_continuous_f0(f0):
    """(utils/pitch_tools.py:152-183)"""
    f0 = np.copy(f0)
    uv = np.float32(f0 != 0)
    if (f0 == 0).all():
        return uv, f0
    start_f0 = f0[f0 != 0][0]
    end_f0 = f0[f0 != 0][-1]
    start_idx = np.where(f0 == start_f0)[0][0]
    end_idx = np.where(f0 == end_f0)[0][-1]
    f0[:start_idx] = start_f0
    f0[end_idx:] = end_f0
    nz = np.where(f0 != 0)[0]
    cont_f0 = interp1d(nz, f0[nz])(np.arange(0, f0.shape[0]))
    return uv, cont_f0


def get_cont_lf0(f0):
    uv, cont_f0 = convert_continuous_f0(f0)
    return uv, np.log(cont_f0)


def get_lf0_cwt_norm(f0s, mean, std):
    """Per-utterance CWT of corpus-normalized log-f0
    (utils/pitch_tools.py:229-255)."""
    Wavelet_lf0s_norm, scaless, means, stds = [], [], [], []
    for f0 in f0s:
        _, cont_lf0 = get_cont_lf0(f0)
        cont_lf0_norm = (cont_lf0 - mean) / std
        W, scales = get_lf0_cwt(cont_lf0_norm)
        Wn, m_s, s_s = norm_scale(W)
        Wavelet_lf0s_norm.append(Wn)
        scaless.append(scales)
        means.append(m_s)
        stds.append(s_s)
    return Wavelet_lf0s_norm, scaless, means, stds


def extract_f0_autocorr(wav, sampling_rate, hop_length, f0_min=80.0,
                        f0_max=750.0, voicing_threshold=0.45):
    """Frame-wise f0 via normalized autocorrelation (CMND, YIN-style).

    Stand-in for parselmouth's autocorrelation pitch tracker; one f0 value
    per hop, 0 for unvoiced frames.
    """
    wav = np.asarray(wav, np.float64)
    frame_len = int(sampling_rate * 0.04)              # 40 ms window
    lag_min = int(sampling_rate / f0_max)
    lag_max = min(int(sampling_rate / f0_min), frame_len - 1)
    n_frames = len(wav) // hop_length
    f0 = np.zeros(n_frames, np.float32)
    pad = np.pad(wav, (frame_len // 2, frame_len + lag_max))
    for i in range(n_frames):
        # true (unbiased) YIN difference over a fixed comparison window:
        # d(τ) = Σ_{t<W} (x[t] − x[t+τ])² — the biased-autocorrelation
        # shortcut 2(r0 − rτ) tapers with τ and drags the dip toward
        # shorter lags (≈1.5% sharp at 100 Hz / 40 ms)
        seg = pad[i * hop_length: i * hop_length + frame_len + lag_max]
        seg = seg - seg.mean()
        win = seg[:frame_len]
        e0 = np.dot(win, win)
        if e0 < 1e-8:
            continue
        corr = np.correlate(seg, win, mode="valid")    # c(τ), τ=0..lag_max
        sq = np.concatenate(([0.0], np.cumsum(seg * seg)))
        e_tau = sq[np.arange(lag_max + 1) + frame_len] - \
            sq[np.arange(lag_max + 1)]                 # Σ_{t<W} x[t+τ]²
        d = e0 + e_tau - 2.0 * corr
        # cumulative mean normalized difference
        cum = np.cumsum(d[1:]) / np.arange(1, lag_max + 1)
        cmnd = np.ones(lag_max + 1)
        cmnd[1:] = d[1:] / np.maximum(cum, 1e-12)
        window = cmnd[lag_min:lag_max]
        if window.size == 0:
            continue
        # YIN absolute-threshold rule: the FIRST dip below threshold, walked
        # to its local minimum — the global argmin often sits on a period
        # multiple (subharmonic/octave-down errors)
        below = np.nonzero(window < voicing_threshold)[0]
        if below.size:
            best = below[0] + lag_min
            while best + 1 < lag_max and cmnd[best + 1] < cmnd[best]:
                best += 1
        else:
            best = int(np.argmin(window)) + lag_min
        if cmnd[best] < voicing_threshold:
            # parabolic interpolation around the minimum
            if 0 < best < lag_max:
                a, b, c = cmnd[best - 1], cmnd[best], cmnd[best + 1]
                denom = a - 2 * b + c
                shift = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
                best = best + np.clip(shift, -1, 1)
            f0[i] = sampling_rate / best
    return f0


def get_pitch(wav, mel_len, preprocess_config):
    """Reference get_pitch contract (utils/pitch_tools.py:85-132): f0 aligned
    to the mel length, plus coarse bins."""
    cfg = preprocess_config["preprocessing"]
    sr = cfg["audio"]["sampling_rate"]
    hop = cfg["stft"]["hop_length"]
    f0 = extract_f0_autocorr(wav, sr, hop)
    if len(f0) < mel_len:
        f0 = np.pad(f0, (0, mel_len - len(f0)), mode="edge")
    f0 = f0[:mel_len]
    pitch_coarse = f0_to_coarse_np(f0)
    return f0, pitch_coarse

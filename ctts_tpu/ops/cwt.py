"""Continuous wavelet transform of log-f0 (Mexican-hat / DOG-2).

Replaces the reference's pycwt dependency (utils/pitch_tools.py:193-294)
with a self-contained FFT implementation (Torrence & Compo 1998
normalization, matching pycwt's conventions: dt=0.005, dj=1, s0=2·dt, J=9 →
10 dyadic scales). Forward transform runs offline (numpy); the inverse
("adhoc" weighted sum with (i+3.5)^-2.5 weights + renormalization) is pure
arithmetic and has a jnp twin used inside the model.
"""

import numpy as np
import jax.numpy as jnp
from scipy.special import gamma as _gamma

# DOG order-2 (Mexican hat) Fourier transform normalizer.
_MH_NORM = 1.0 / np.sqrt(_gamma(2.5))

DT = 0.005
DJ = 1.0
S0 = DT * 2
J = 9


def _mexican_hat_ft(w):
    """ψ̂(ω) for the Mexican hat; real-valued ((-1j)^2 factor = +1)."""
    return _MH_NORM * (w ** 2) * np.exp(-0.5 * w ** 2)


def cwt_mexican_hat(signal, dt=DT, dj=DJ, s0=S0, jtot=J):
    """CWT of a 1-D signal. Returns (W [T, jtot+1] real, scales [jtot+1])."""
    signal = np.asarray(signal, np.float64)
    n0 = signal.shape[0]
    n = int(2 ** np.ceil(np.log2(n0)))          # zero-pad to pow2
    ftfreqs = 2.0 * np.pi * np.fft.fftfreq(n, dt)
    sj = s0 * 2.0 ** (np.arange(0, jtot + 1) * dj)
    sig_ft = np.fft.fft(signal, n)
    # (2π s / dt)^0.5 energy normalization (T&C eq. 6 as implemented by pycwt)
    psi_ft_bar = (np.sqrt(sj[:, None] * ftfreqs[1] * n)
                  * np.conjugate(_mexican_hat_ft(sj[:, None] * ftfreqs[None, :])))
    W = np.fft.ifft(sig_ft[None, :] * psi_ft_bar, n)[:, :n0]
    return np.real(W).T, sj


def get_lf0_cwt(lf0):
    """Reference-parity wrapper (utils/pitch_tools.py:193-209):
    (T,) log-f0 → ([T, 10] spectrogram, scales)."""
    return cwt_mexican_hat(np.squeeze(lf0))


def norm_scale(Wavelet_lf0):
    """Standardize each scale column; returns (normed, mean, std)."""
    mean = Wavelet_lf0.mean(0)[None, :]
    std = Wavelet_lf0.std(0)[None, :]
    return (Wavelet_lf0 - mean) / std, mean, std


def inverse_cwt(Wavelet_lf0, num_scales=10):
    """[B, T, S] CWT → [B, T] reconstructed signal (zero-mean, unit-std).

    Uses the reference's fixed empirical scale weights
    (i+1+2.5)^-2.5 followed by per-utterance renormalization
    (utils/pitch_tools.py:258-272). jnp, differentiable.
    """
    b = (jnp.arange(num_scales, dtype=jnp.float32)[None, None, :] + 1.0 + 2.5) ** (-2.5)
    rec = jnp.sum(Wavelet_lf0 * b, axis=-1)
    mean = jnp.mean(rec, axis=-1, keepdims=True)
    # torch.std default is Bessel-corrected (n-1) — match it
    std = jnp.std(rec, axis=-1, keepdims=True, ddof=1)
    return (rec - mean) / jnp.maximum(std, 1e-8)


def cwt2f0(cwt_spec, mean, std):
    """CWT spectrogram + per-utterance (mean, std) of log-f0 → f0 in Hz.

    cwt_spec: [B, T, 10]; mean/std: [B]. (utils/pitch_tools.py:275-286;
    the reference's exp() of the denormalized log-f0.)
    """
    f0 = inverse_cwt(cwt_spec, cwt_spec.shape[-1])
    f0 = f0 * std[:, None] + mean[:, None]
    return jnp.exp(jnp.clip(f0, -20.0, 20.0))


def cwt2f0_norm(cwt_spec, mean, std, t_mel, pitch_config):
    """Reconstruct NORMALIZED f0 at frame resolution t_mel
    (utils/pitch_tools.py:289-294). Output [B, t_mel]."""
    from ctts_tpu.ops.pitch import norm_f0
    f0 = cwt2f0(cwt_spec, mean, std)
    T = f0.shape[1]
    if t_mel > T:
        f0 = jnp.concatenate(
            [f0, jnp.repeat(f0[:, -1:], t_mel - T, axis=1)], axis=1)
    else:
        f0 = f0[:, :t_mel]
    return norm_f0(f0, None, pitch_config)

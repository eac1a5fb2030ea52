"""Chunked streaming vocoder: exactness vs the full pass (to float
reassociation) + measured receptive field (ctts_tpu/vocoder/streaming.py).

The halo-crop construction is mathematically exact; the only deviation
between the chunked and full outputs is XLA compiling the two shapes with
different fusion orders, which reassociates float32 sums (~5e-7 on a
tanh-bounded signal). A halo bug would instead show errors GROWING toward
chunk boundaries at signal scale (~0.1), so the tight uniform atol below
distinguishes the two regimes decisively."""

import numpy as np
import jax
import jax.numpy as jnp

from ctts_tpu.vocoder.hifigan import HiFiGANGenerator, V1_CONFIG
from ctts_tpu.vocoder.streaming import make_chunked_vocoder, RF_MEL


def _small_gen():
    """V1 topology with narrow channels so the CPU test stays fast; the
    receptive field depends only on kernels/strides, not widths."""
    cfg = dict(V1_CONFIG, upsample_initial_channel=32)
    gen = HiFiGANGenerator(cfg)
    mel0 = jnp.zeros((1, 16, 80), jnp.float32)
    var = gen.init(jax.random.PRNGKey(0), mel0)
    return gen, var


def test_receptive_field():
    gen, var = _small_gen()
    rng = np.random.RandomState(0)
    T = 64
    mel = jnp.asarray(rng.randn(1, T, 80).astype(np.float32))
    base = np.asarray(gen.apply(var, mel))
    t0 = T // 2
    pert = mel.at[:, t0, :].add(1.0)
    diff = np.abs(np.asarray(gen.apply(var, pert)) - base)[0]
    changed = np.nonzero(diff > 1e-7)[0]
    lo_frame = t0 - changed.min() // 256        # frames of left influence
    hi_frame = changed.max() // 256 - t0
    rf = max(lo_frame, hi_frame)
    assert rf <= RF_MEL, f"measured RF {rf} exceeds RF_MEL={RF_MEL}"
    assert rf >= 8      # sanity: the MRF stacks reach several frames


def test_chunked_vocoder_is_exact():
    gen, var = _small_gen()
    rng = np.random.RandomState(1)
    B, T, chunk = 2, 128, 32
    mel = jnp.asarray(rng.randn(B, T, 80).astype(np.float32) * 2 - 5)
    full = np.asarray(gen.apply(var, mel))

    stream = make_chunked_vocoder(gen.apply, var, chunk=chunk)
    chunks = [np.asarray(c) for c in stream(mel)]
    assert len(chunks) == T // chunk
    got = np.concatenate(chunks, axis=1)
    assert got.shape == full.shape
    # float32-epsilon agreement everywhere, including at every chunk
    # boundary and the utterance edges (signal rms ~0.37, so 2e-6 is
    # ~5 orders of magnitude below a halo artifact)
    np.testing.assert_allclose(got, full, rtol=0, atol=2e-6)
    # the error must NOT concentrate at chunk boundaries
    for i in range(1, T // chunk):
        edge = abs(got - full)[:, i * chunk * 256 - 256:i * chunk * 256 + 256]
        assert edge.max() < 2e-6


def test_melgan_receptive_field():
    from ctts_tpu.vocoder.melgan import MelGANGenerator
    from ctts_tpu.vocoder.streaming import RF_MEL_MELGAN
    gen = MelGANGenerator()
    var = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 80), jnp.float32))
    rng = np.random.RandomState(0)
    T = 96
    mel = jnp.asarray(rng.randn(1, T, 80).astype(np.float32))
    base = np.asarray(gen.apply(var, mel))
    t0 = T // 2
    diff = np.abs(np.asarray(gen.apply(var, mel.at[:, t0, :].add(1.0)))
                  - base)[0]
    changed = np.nonzero(diff > 1e-7)[0]
    rf = max(t0 - changed.min() // 256, changed.max() // 256 - t0)
    assert rf <= RF_MEL_MELGAN, f"measured RF {rf} > {RF_MEL_MELGAN}"


def test_vocoder_stream_matches_vocoder_infer():
    """The serving helper (utils/model.py vocoder_stream) reproduces
    vocoder_infer's int16 output through padding, scaling and trimming."""
    from ctts_tpu.utils.model import vocoder_infer, vocoder_stream
    gen, var = _small_gen()
    tup = ("HiFi-GAN", gen, var)
    pre = {"preprocessing": {"audio": {"max_wav_value": 32768.0},
                             "stft": {"hop_length": 256}}}
    rng = np.random.RandomState(3)
    mels = rng.randn(2, 72, 80).astype(np.float32) * 2 - 5   # 72 % 32 != 0
    lens = np.array([70, 41])
    want = vocoder_infer(mels, tup, pre, lengths=lens)
    got = np.concatenate(
        list(vocoder_stream(mels, tup, pre, chunk=32)), axis=1)
    for i, n in enumerate(lens):
        w, g = want[i], got[i, :n * 256]
        assert g.shape == w.shape
        # int16 quantization makes float-reassociation noise at most 1 LSB
        assert np.abs(g.astype(np.int32) - w.astype(np.int32)).max() <= 1


def test_vocoder_stream_melgan_matches_infer():
    """MelGAN streaming must apply the same /log(10) mel scaling as
    vocoder_infer and use its own (smaller) receptive-field halo."""
    from ctts_tpu.vocoder.melgan import MelGANGenerator
    from ctts_tpu.utils.model import vocoder_infer, vocoder_stream
    gen = MelGANGenerator()
    var = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 80),
                                                    jnp.float32))
    tup = ("MelGAN", gen, var)
    pre = {"preprocessing": {"audio": {"max_wav_value": 32768.0},
                             "stft": {"hop_length": 256}}}
    rng = np.random.RandomState(4)
    mels = rng.randn(1, 80, 80).astype(np.float32) * 2 - 5
    lens = np.array([77])
    want = vocoder_infer(mels, tup, pre, lengths=lens)
    got = np.concatenate(list(vocoder_stream(mels, tup, pre, chunk=32)),
                         axis=1)
    d = np.abs(got[0, :77 * 256].astype(np.int32)
               - want[0].astype(np.int32))
    assert d.max() <= 1


def test_chunked_vocoder_short_utterance_fallback():
    gen, var = _small_gen()
    rng = np.random.RandomState(2)
    mel = jnp.asarray(rng.randn(1, 32, 80).astype(np.float32))
    stream = make_chunked_vocoder(gen.apply, var, chunk=32, halo=16)
    (only,) = list(stream(mel))
    # the short path is JITTED (eager apply through the TPU tunnel is the
    # ~100x op-by-op dispatch class) — jit reassociates float sums vs the
    # eager reference, so allow float32-epsilon noise, not bit-equality
    np.testing.assert_allclose(np.asarray(only),
                               np.asarray(gen.apply(var, mel)), atol=2e-6)

"""Chunked (streaming) vocoding with exact overlap-crop.

The acoustic model is non-autoregressive, so end-to-end latency is
dominated by vocoding the WHOLE utterance before the first sample can be
played. The HiFi-GAN generator is a finite-receptive-field convnet: output
sample n depends only on mel frames within RF_MEL frames of n // hop.
Vocoding a window of `chunk + 2*halo` frames and cropping the center
`chunk * hop` samples is therefore mathematically EXACT vs the full pass
whenever `halo >= RF_MEL` — including through every nonlinearity, because
the receptive-field bound is pure locality. Conv edge padding only corrupts
samples within RF of the *window* edges, which the crop discards; at the
true utterance edges the window boundary coincides with the utterance
boundary, so the conv padding there matches the full pass too. In practice
the window and full graphs compile at different shapes, so XLA fusion
reassociates float sums differently: the observed deviation is
~5e-7 absolute on a tanh-bounded [-1, 1] signal (float32 epsilon, NOT a
halo artifact — it does not grow near chunk boundaries).
`tests/test_streaming.py` checks this bound and measures the true RF by
input perturbation.

Every window has the same static shape → ONE compiled graph regardless of
utterance length. The whole per-chunk pipeline (vocode + center-crop) is a
single jitted call on a host-sliced window: window extraction happens in
numpy (the serving path's mel is host-resident anyway) and the crop offset
is a traced scalar, so the loop issues ZERO eager device ops — on this
runtime each eager dispatch through the TPU tunnel costs ~0.5 s, and the
first version of this file (eager dynamic_slice per chunk) measured a
6.5 s time-to-first-audio where the full pass took 135 ms total
(tools/loadtest_serve.py --ttfa). All chunks are enqueued asynchronously
before the first fetch, so the device computes chunk i+1..n while the host
streams out chunk i.

MEASURED time-to-first-audio on the real chip (SERVING_TTFA.json, 32
requests over a real HTTP socket, trained step-6000 weights, ~3.9 s
utterances): streaming TTFA p50 120.7 ms / p95 129.1 ms vs the full
non-streaming path's 135.7 / 139.7 ms, with the remaining chunks arriving
over the next ~134 ms (total p50 254.6 ms, 1.87x the full pass — the
per-chunk D2H fetches). At these utterance lengths the B=1 acoustic pass
dominates TTFA; the streaming win grows with utterance length since the
full path's vocode is linear in T while the first window is constant.

For HiFi-GAN V1 the measured mel-frame receptive field is 13 frames per
side (conv_pre 3 + transposed convs + MRF stacks, each divided by its
stage's upsampling rate); RF_MEL = 16 leaves slack for config tweaks.

The reference has no streaming path (it vocodes full utterances,
ref utils/model.py:74-92); this is a serving capability on top of parity.
"""

import jax
import jax.numpy as jnp
import numpy as np

# conservative per-side receptive fields in mel frames (measured by input
# perturbation in tests/test_streaming.py::test_receptive_field: HiFi-GAN V1
# = 13, MelGAN = 6; the constants leave slack for config tweaks)
RF_MEL = 16
RF_MEL_MELGAN = 8


def make_chunked_vocoder(apply_fn, variables, chunk=64, halo=RF_MEL,
                         hop=256):
    """Build a streaming vocoder from a full-utterance apply function.

    apply_fn(variables, mel[B, W, n_mel]) -> wav[B, W*hop] is the ordinary
    generator call (e.g. HiFiGANGenerator.apply). Returns
    `stream(mel) -> iterator of host wav chunks [B, chunk*hop]` (the last
    chunk is [B, (T % chunk)*hop] when T is not a chunk multiple), exact
    w.r.t. apply_fn(variables, mel) up to float-reassociation noise (~1e-6)
    as long as halo >= the generator's mel-frame receptive field and mel
    has at least chunk + 2*halo frames. Chunks are numpy arrays: the
    consumer is a playback/network stream, so the D2H fetch is part of the
    pipeline, ordered so the device runs ahead of it.
    """
    if chunk <= 0 or halo < 0:
        raise ValueError(f"bad chunk={chunk} / halo={halo}")
    window = chunk + 2 * halo

    @jax.jit
    def _vocode_window(mel_win, crop):
        # vocode one window and center-crop in the SAME graph: a traced
        # crop offset keeps this a single compiled shape for every chunk,
        # and no eager slice ever hits the device
        wav = apply_fn(variables, mel_win)
        return jax.lax.dynamic_slice_in_dim(wav, crop, chunk * hop, axis=1)

    # short-utterance full pass, jitted: eager apply here would be the
    # exact op-by-op dispatch class measured at ~100x through the TPU
    # tunnel (CLAUDE.md TIMING TRAP #4). jit caches per mel length, and
    # the stream closure itself is memoized per (model, variables) in
    # utils/model.py _STREAM_JIT, so the cache persists across requests.
    _vocode_full = jax.jit(lambda m: apply_fn(variables, m))

    def stream(mel):
        T = mel.shape[1]
        if T < window:
            # short utterance: one full pass is already "streamed"
            yield np.asarray(_vocode_full(jnp.asarray(mel)))
            return
        # window extraction on HOST: the serving path's mel is already
        # host-resident, and numpy slices cost nothing; each window then
        # uploads ~window*n_mel*4 bytes (tens of KB) asynchronously
        mel = np.asarray(mel)
        n_full, tail = divmod(T, chunk)
        jobs = []
        for i in range(n_full):
            # clamp the window inside the utterance so its edges coincide
            # with the true edges exactly when the chunk touches them (conv
            # padding then matches the full pass); interior windows carry
            # real frames on both sides and the crop discards everything
            # within RF of the window edges
            off = min(max(i * chunk - halo, 0), T - window)
            jobs.append((off, (i * chunk - off) * hop, chunk * hop))
        if tail:
            # final partial chunk: end-align the SAME static window shape
            # to the true utterance edge (so conv padding there matches the
            # full pass). The graph's crop length is static (chunk*hop), so
            # crop the last chunk*hop samples on device — they contain the
            # tail*hop suffix, which the host trims for free below.
            jobs.append((T - window, (window - chunk) * hop, tail * hop))
        # enqueue EVERY chunk before fetching the first: dispatch is async,
        # so the device computes chunks i+1..n while the host fetches and
        # streams out chunk i
        outs = [_vocode_window(jnp.asarray(mel[:, off:off + window]), crop)
                for off, crop, _keep in jobs]
        for (_off, _crop, keep), wav in zip(jobs, outs):
            w = np.asarray(wav)
            yield w if keep == chunk * hop else w[:, -keep:]

    return stream

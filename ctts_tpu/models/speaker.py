"""Speaker embedding: DeepSpeaker ResCNN (JAX) used offline by the
preprocessor for multi-speaker recipes.

Faithful re-implementation of the reference's TF/Keras embedder
(deepspeaker/conv_models.py ResCNN + embedding.py:8-27): 64-bin log-fbank
features, 160-frame crops, 4 stages of [conv5x5 s2 → BN → clipped-relu →
3 × identity block] at 64/128/256/512 channels (identity block =
conv3 → BN → crelu → conv3 → BN → crelu → +input → crelu,
conv_models.py:85-112), frame-average pooling over the flattened 4·512
features, 512-d affine, L2 norm (conv_models.py:50-66).

Pretrained weights are an external download like the reference
(model/speaker_embedder.py:25-27); `load_keras_weights` ports the Keras .h5
checkpoint (both the legacy full-model layout with a `model_weights` group
and a bare save_weights layout). Embedding parity vs the actual Keras model
is tested in tests/test_speaker_parity.py.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

NUM_FBANKS = 64
NUM_FRAMES = 160
SAMPLE_RATE = 16000
_FILTERS = (64, 128, 256, 512)
_BN_EPS = 1e-3          # Keras BatchNormalization default epsilon


def _crelu(x):
    return jnp.clip(x, 0.0, 20.0)


class _IdentityBlock(nn.Module):
    """conv_models.py:85-112 (BN in inference mode; the embedder is an
    offline frozen network)."""
    filters: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.filters, (3, 3), padding="SAME",
                    param_dtype=jnp.float32, name="conv_a")(x)
        h = nn.BatchNorm(use_running_average=True, epsilon=_BN_EPS,
                         param_dtype=jnp.float32, name="bn_a")(h)
        h = _crelu(h)
        h = nn.Conv(self.filters, (3, 3), padding="SAME",
                    param_dtype=jnp.float32, name="conv_b")(h)
        h = nn.BatchNorm(use_running_average=True, epsilon=_BN_EPS,
                         param_dtype=jnp.float32, name="bn_b")(h)
        h = _crelu(h)
        return _crelu(h + x)


class ResCNN(nn.Module):
    """fbank [B, T, 64, 1] → [B, 512] L2-normalized embedding."""
    embedding_dim: int = 512

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(_FILTERS):
            x = nn.Conv(f, (5, 5), strides=(2, 2), padding="SAME",
                        param_dtype=jnp.float32, name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=_BN_EPS,
                             param_dtype=jnp.float32, name=f"bn_{i}")(x)
            x = _crelu(x)
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
    """Callable wav → (1, 512) embedding (model/speaker_embedder.py:11-42).

    Weight resolution order: explicit `weights_path` argument, the
    `path.deepspeaker_weights` config key, the CTTS_DEEPSPEAKER_H5 env var.
    Without weights this FAILS LOUDLY (random-net embeddings are not the
    reference speaker space) unless CTTS_ALLOW_RANDOM_SPEAKER=1 opts in.
    """

    def __init__(self, preprocess_config, weights_path=None):
        self.sampling_rate = \
            preprocess_config["preprocessing"]["audio"]["sampling_rate"]
        self.model = ResCNN()
        self.variables = None
        self.weights_path = (
            weights_path
            or preprocess_config.get("path", {}).get("deepspeaker_weights")
            or os.environ.get("CTTS_DEEPSPEAKER_H5"))
        if not self.weights_path or not os.path.exists(self.weights_path):
            if os.environ.get("CTTS_ALLOW_RANDOM_SPEAKER") != "1":
                raise RuntimeError(
                    "DeepSpeaker pretrained weights not found "
                    f"(looked at {self.weights_path!r}). Download the "
                    "ResCNN .h5 checkpoint and point path.deepspeaker_weights"
                    " or CTTS_DEEPSPEAKER_H5 at it, supply precomputed "
                    "*-spker_embed.npy files, or set "
                    "CTTS_ALLOW_RANDOM_SPEAKER=1 to accept random-net "
                    "(non-reference) speaker features.")
            self.weights_path = None
        self._apply = jax.jit(self.model.apply)

    def _ensure_init(self):
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
        self._ensure_init()
        emb = self._apply(self.variables, jnp.asarray(crop)[None, :, :, None])
        return np.asarray(emb)                           # (1, 512)


def load_keras_weights(h5_path, variables):
    """Port the reference ResCNN Keras checkpoint onto the flax tree.

    Handles the legacy full-model .h5 (root `model_weights` group, what the
    published ResCNN_triplet_training_checkpoint_265.h5 is) and bare
    save_weights layouts; weight names with and without the TF1 `:0`
    suffix."""
    import h5py

    with h5py.File(h5_path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        flat = {}

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                key = name[:-2] if name.endswith(":0") else name
                flat[key] = np.asarray(obj)

        root.visititems(visit)

    def get(layer, wname):
        for key in (f"{layer}/{layer}/{wname}", f"{layer}/{wname}"):
            if key in flat:
                return flat[key]
        raise KeyError(f"{layer}/{wname} not in checkpoint "
                       f"(have e.g. {sorted(flat)[:4]})")

    def conv(layer):
        return {"kernel": get(layer, "kernel"),       # TF [kh,kw,in,out] ==
                "bias": get(layer, "bias")}           # flax layout

    def bn(layer):
        return ({"scale": get(layer, "gamma"), "bias": get(layer, "beta")},
                {"mean": get(layer, "moving_mean"),
                 "var": get(layer, "moving_variance")})

    params, stats = {}, {}
    for i, fch in enumerate(_FILTERS):
        stage = i + 1
        params[f"conv_{i}"] = conv(f"conv{fch}-s")
        params[f"bn_{i}"], stats[f"bn_{i}"] = bn(f"conv{fch}-s_bn")
        for j in range(3):
            base = f"res{stage}_{j}_branch"
            blk_p, blk_s = {}, {}
            blk_p["conv_a"] = conv(f"{base}_2a")
            blk_p["bn_a"], blk_s["bn_a"] = bn(f"{base}_2a_bn")
            blk_p["conv_b"] = conv(f"{base}_2b")
            blk_p["bn_b"], blk_s["bn_b"] = bn(f"{base}_2b_bn")
            params[f"res_{i}_{j}"] = blk_p
            stats[f"res_{i}_{j}"] = blk_s
    params["affine"] = {"kernel": get("affine", "kernel"),
                        "bias": get("affine", "bias")}

    ported = {"params": params, "batch_stats": stats}
    want = jax.tree_util.tree_structure(variables)
    got = jax.tree_util.tree_structure(ported)
    assert want == got, f"checkpoint/model mismatch:\n{want}\n{got}"
    return jax.tree.map(jnp.asarray, ported)

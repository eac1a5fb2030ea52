"""Variance predictors (duration / pitch / energy) — flax, [B, T, C].

Faithful math of the reference predictors (model/modules.py:1252-1360):
conv→ReLU→LayerNorm→dropout stacks with a final linear head; the pitch
predictor adds a learned-alpha sinusoidal positional embedding. The
reference's grad-scaling of predictor inputs (predictor_grad) is applied by
the caller via :func:`grad_scale`.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctts_tpu.models.blocks import (Conv1d, LayerNorm,
                                    SinusoidalPositionalEmbedding)


def grad_scale(x, scale):
    """x in the forward pass; scale·dx in the backward pass
    (model/modules.py:1026: detach + g*(x - detach))."""
    sg = jax.lax.stop_gradient(x)
    return sg + scale * (x - sg)


class _ConvStack(nn.Module):
    n_layers: int
    n_chans: int
    kernel_size: int
    dropout_rate: float
    padding: str = "SAME"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic=True):
        for i in range(self.n_layers):
            x = Conv1d(self.n_chans, self.kernel_size, padding=self.padding,
                       dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.relu(x)
            x = LayerNorm(dtype=self.dtype)(x)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
            if padding_mask is not None:
                x = jnp.where(padding_mask[..., None], 0.0, x)
        return x


class DurationPredictor(nn.Module):
    """Log-domain duration head (model/modules.py:1252-1310).

    Head width follows the reference's dur_loss switch
    (modules.py:1289-1297): "mse"/"huber" -> 1 (log-duration), "mog" -> 15
    (5-component MDN over log(d+1): [weight logits | means | log-sigmas]),
    "crf" -> 32 (emission scores over duration classes 0..31). The
    reference declares mog/crf but raises NotImplementedError in the loss;
    here they are working (see MOG_COMPONENTS/ops/crf.py and loss.py).
    """
    n_layers: int = 2
    n_chans: int = 256
    kernel_size: int = 3
    dropout_rate: float = 0.5
    padding: str = "SAME"
    dur_loss: str = "mse"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True):
        odims = {"mse": 1, "huber": 1, "mog": 15,
                 "crf": 32}[self.dur_loss]
        x = _ConvStack(self.n_layers, self.n_chans, self.kernel_size,
                       self.dropout_rate, self.padding, self.dtype,
                       name="conv")(x, padding_mask, deterministic)
        x = nn.Dense(odims, dtype=self.dtype, param_dtype=jnp.float32,
                     name="linear")(x)
        x = jnp.where(padding_mask[..., None], 0.0, x)
        if self.dur_loss in ("mse", "huber"):
            return x[..., 0].astype(jnp.float32)      # [B, T] log-durations
        return x.astype(jnp.float32)                  # [B, T, odims]


MOG_COMPONENTS = 5


def mog_split(params):
    """[..., 15] -> (weight logits, means, log-sigmas), each [..., 5]."""
    return jnp.split(params, 3, axis=-1)


def mog_nll(params, y):
    """Negative log-likelihood of y [B, T] (= log(dur+1)) under the
    5-component MDN params [B, T, 15]. Returns [B, T]."""
    w, mu, ls = mog_split(params)
    logw = jax.nn.log_softmax(w, axis=-1)
    z = (y[..., None] - mu) * jnp.exp(-ls)
    comp = -0.5 * z * z - ls - 0.5 * jnp.log(2.0 * jnp.pi)
    return -jax.nn.logsumexp(logw + comp, axis=-1)


def mog_mean(params):
    """Posterior-mean log-duration E[y] [B, T]."""
    w, mu, _ = mog_split(params)
    return jnp.sum(jax.nn.softmax(w, axis=-1) * mu, axis=-1)


class DurationCRF(nn.Module):
    """Parameters of the 32-class duration CRF (torchcrf.CRF equivalent,
    reference modules.py:1293-1296); the algorithms live in ops/crf.py."""
    num_tags: int = 32

    def setup(self):
        init = lambda key, shape: jax.random.uniform(  # noqa: E731
            key, shape, jnp.float32, -0.1, 0.1)        # torchcrf reset range
        self.start_transitions = self.param("start_transitions", init,
                                            (self.num_tags,))
        self.end_transitions = self.param("end_transitions", init,
                                          (self.num_tags,))
        self.transitions = self.param("transitions", init,
                                      (self.num_tags, self.num_tags))

    def log_likelihood(self, emissions, tags, valid):
        from ctts_tpu.ops.crf import crf_log_likelihood
        return crf_log_likelihood(emissions, tags, valid,
                                  self.start_transitions,
                                  self.end_transitions, self.transitions)

    def decode(self, emissions, valid):
        from ctts_tpu.ops.crf import viterbi_decode
        return viterbi_decode(emissions, valid, self.start_transitions,
                              self.end_transitions, self.transitions)


class PitchPredictor(nn.Module):
    """Pitch head with learned-alpha positions (model/modules.py:1313-1356).
    odim: 2 (frame f0+uv) | 1 (ph) | 10/11 (cwt)."""
    odim: int = 2
    n_layers: int = 2
    n_chans: int = 256
    kernel_size: int = 5
    dropout_rate: float = 0.5
    padding: str = "SAME"
    max_positions: int = 4096
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True):
        alpha = self.param("pos_embed_alpha", nn.initializers.ones, (1,),
                           jnp.float32)
        pos = SinusoidalPositionalEmbedding(
            x.shape[-1], self.max_positions, self.dtype)(padding_mask)
        x = x + alpha * pos
        x = _ConvStack(self.n_layers, self.n_chans, self.kernel_size,
                       self.dropout_rate, self.padding, self.dtype,
                       name="conv")(x, None, deterministic)
        x = nn.Dense(self.odim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="linear")(x)
        return x.astype(jnp.float32)                   # [B, T, odim]


class EnergyPredictor(PitchPredictor):
    """Same architecture, odim=1 (model/modules.py:1359-1360)."""
    pass


class _ARCell(nn.Module):
    """One AR step: GRU over [conv feature ‖ previous-frame f0] + linear
    head. `teacher_forced` picks the forced f0 stream over the fed-back
    prediction; both variants share parameters (the flag is static per
    mode, so train/infer are separate compilations of the same weights)."""
    n_chans: int
    odim: int
    teacher_forced: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, xs):
        state, prev = carry                     # [B, C], [B]
        feat_t, forced_t = xs                   # [B, C], [B]
        if self.teacher_forced:
            prev = forced_t
        inp = jnp.concatenate(
            [feat_t, prev[:, None].astype(feat_t.dtype)], axis=-1)
        state, y = nn.GRUCell(self.n_chans, dtype=self.dtype,
                              param_dtype=jnp.float32, name="gru")(state, inp)
        out = nn.Dense(self.odim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="head")(y).astype(jnp.float32)
        return (state, out[:, 0]), out


class PitchPredictorAR(nn.Module):
    """Autoregressive frame-pitch head.

    The reference enables this branch for `pitch_ar: True`
    (model/modules.py:922-925) but passes the f0 tensor into
    PitchPredictor.forward's `squeeze` positional slot — there is no AR
    model behind it (latent bug; it merely squeezes the output). This is
    the *intended* semantics: the PitchPredictor conv trunk summarizes the
    decoder input, then a GRU predicts frame t conditioned on f0_{t-1} —
    teacher-forced during training, fed back through a single lax.scan at
    inference (static shapes; one compile per mode)."""
    odim: int = 2
    n_layers: int = 2
    n_chans: int = 256
    kernel_size: int = 5
    dropout_rate: float = 0.5
    padding: str = "SAME"
    max_positions: int = 4096
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask, f0=None, deterministic=True):
        alpha = self.param("pos_embed_alpha", nn.initializers.ones, (1,),
                           jnp.float32)
        pos = SinusoidalPositionalEmbedding(
            x.shape[-1], self.max_positions, self.dtype)(padding_mask)
        x = x + alpha * pos
        h = _ConvStack(self.n_layers, self.n_chans, self.kernel_size,
                       self.dropout_rate, self.padding, self.dtype,
                       name="conv")(x, None, deterministic)

        B, T = x.shape[0], x.shape[1]
        teacher = f0 is not None
        if teacher:                 # shift right: frame t sees target t-1
            forced = jnp.pad(f0[:, :-1], ((0, 0), (1, 0)))
        else:
            forced = jnp.zeros((B, T), jnp.float32)
        scan = nn.scan(_ARCell, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=1, out_axes=1)
        cell = scan(self.n_chans, self.odim, teacher_forced=teacher,
                    dtype=self.dtype, name="ar")
        carry0 = (jnp.zeros((B, self.n_chans), self.dtype),
                  jnp.zeros((B,), jnp.float32))
        _, out = cell(carry0, (h, forced))
        return out                                 # [B, T, odim], fp32


class CwtStatsLayers(nn.Module):
    """MLP predicting per-utterance (f0_mean, f0_std) from the first encoder
    frame (model/modules.py:773-776)."""
    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x0):
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32)(x0)
        x = nn.relu(x)
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        return nn.Dense(2, dtype=self.dtype,
                        param_dtype=jnp.float32)(x).astype(jnp.float32)

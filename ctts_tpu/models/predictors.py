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
    """Log-domain duration head (model/modules.py:1252-1310)."""
    n_layers: int = 2
    n_chans: int = 256
    kernel_size: int = 3
    dropout_rate: float = 0.5
    padding: str = "SAME"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True):
        x = _ConvStack(self.n_layers, self.n_chans, self.kernel_size,
                       self.dropout_rate, self.padding, self.dtype,
                       name="conv")(x, padding_mask, deterministic)
        x = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32,
                     name="linear")(x)
        x = jnp.where(padding_mask[..., None], 0.0, x)
        return x[..., 0].astype(jnp.float32)          # [B, T] log-durations


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

"""PostNet: 5×(conv k5, 512ch, BN, tanh, dropout), residual added by caller
(reference model/modules.py:78-148)."""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ctts_tpu.models.blocks import ConvNorm


class PostNet(nn.Module):
    n_mel_channels: int = 80
    embedding_dim: int = 512
    kernel_size: int = 5
    n_convolutions: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training=True, deterministic=True):
        # x: [B, T, n_mel]
        for i in range(self.n_convolutions - 1):
            x = ConvNorm(self.embedding_dim, self.kernel_size,
                         dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not training,
                             param_dtype=jnp.float32, dtype=self.dtype,
                             name=f"bn_{i}")(x)
            x = jnp.tanh(x)
            x = nn.Dropout(0.5)(x, deterministic=deterministic)
        x = ConvNorm(self.n_mel_channels, self.kernel_size, dtype=self.dtype,
                     name=f"conv_{self.n_convolutions - 1}")(x)
        x = nn.BatchNorm(use_running_average=not training,
                         param_dtype=jnp.float32, dtype=self.dtype,
                         name=f"bn_{self.n_convolutions - 1}")(x)
        x = nn.Dropout(0.5)(x, deterministic=deterministic)
        return x.astype(jnp.float32)

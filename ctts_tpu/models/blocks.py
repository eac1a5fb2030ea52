"""Shared neural building blocks (flax.linen, [B, T, C] layout throughout).

Functional re-design of the reference's primitive zoo
(model/transformers/blocks.py). Notable differences from the torch version:
no T×B×C transposes (XLA prefers batch-major), positions are computed from
padding masks instead of probing feature values, and dtype is a first-class
knob so the transformer stacks can run in bfloat16 on the MXU while params
stay float32.
"""

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def sinusoid_table(num_positions, dim, dtype=jnp.float32):
    """tensor2tensor-style sinusoid table: [sin | cos] concatenated
    (reference blocks.py:66-83). Row 0 (padding position) is zero."""
    half = dim // 2
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                   * -(math.log(10000.0) / (half - 1)))
    pos = jnp.arange(num_positions, dtype=jnp.float32)[:, None] * freq[None, :]
    emb = jnp.concatenate([jnp.sin(pos), jnp.cos(pos)], axis=1)
    if dim % 2 == 1:
        emb = jnp.concatenate([emb, jnp.zeros((num_positions, 1))], axis=1)
    emb = emb.at[0].set(0.0)
    return emb.astype(dtype)


def positions_from_mask(padding_mask):
    """Padding-aware position ids: non-pad tokens numbered 1..len
    (reference utils/tools.py:640-652 with padding_idx=0)."""
    nonpad = (~padding_mask).astype(jnp.int32)
    return jnp.cumsum(nonpad, axis=1) * nonpad


class SinusoidalPositionalEmbedding(nn.Module):
    """Padding-aware sinusoidal positions looked up from a static table."""
    dim: int
    max_positions: int = 4096
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, padding_mask):
        table = sinusoid_table(self.max_positions + 1, self.dim, self.dtype)
        pos = positions_from_mask(padding_mask)
        return jnp.take(table, jnp.minimum(pos, self.max_positions), axis=0)


class LayerNorm(nn.Module):
    """LayerNorm with the reference's eps (1e-12, blocks.py:137-156)."""
    eps: float = 1e-12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                            param_dtype=jnp.float32)(x)


class Conv1d(nn.Module):
    """1-D conv over [B, T, C] with SAME or LEFT (causal) padding."""
    features: int
    kernel_size: int
    padding: str = "SAME"          # "SAME" | "LEFT"
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.padding == "LEFT":
            pad = [(self.kernel_size - 1, 0)]
        else:
            k = self.kernel_size
            pad = [((k - 1) // 2, k // 2)]
        return nn.Conv(self.features, (self.kernel_size,), padding=pad,
                       use_bias=self.use_bias, dtype=self.dtype,
                       param_dtype=jnp.float32)(x)


class ConvNorm(nn.Module):
    """Xavier-initialized conv (reference ConvNorm, blocks.py:255-298)."""
    features: int
    kernel_size: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        d = self.dilation
        pad = [(d * (k - 1) // 2, d * (k - 1) - d * (k - 1) // 2)]
        return nn.Conv(self.features, (k,), kernel_dilation=(d,), padding=pad,
                       use_bias=self.use_bias, dtype=self.dtype,
                       param_dtype=jnp.float32,
                       kernel_init=nn.initializers.xavier_uniform())(x)


class ConvBlock(nn.Module):
    """Conv + norm + activation (+dropout), masked (blocks.py:175-210)."""
    features: int
    kernel_size: int
    dropout: Optional[float] = None
    activation: Callable = nn.relu
    layer_norm: bool = True        # reference uses LayerNorm variant here
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        x = ConvNorm(self.features, self.kernel_size, dtype=self.dtype)(x)
        if self.layer_norm:
            x = LayerNorm(dtype=self.dtype)(x)
        x = self.activation(x)
        if self.dropout is not None:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        if mask is not None:
            x = jnp.where(mask[..., None], 0.0, x)
        return x


class MultiHeadAttention(nn.Module):
    """Standard softmax MHA over [B, T, C]; padding-masked.

    Equivalent to the reference fs2 MultiheadAttention fast path
    (transformer_fs2.py:385-406): joint QKV projection, no biases, scale
    1/sqrt(head_dim), -1e9 at padded keys.
    """
    num_heads: int
    dropout: float = 0.0
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True,
                 kv=None):
        C = x.shape[-1]
        H = self.num_heads
        Dh = C // H
        kv = x if kv is None else kv
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            (H, Dh), use_bias=self.use_bias, dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(), name=name)
        q = dense("q")(x)                       # [B, Tq, H, Dh]
        k = dense("k")(kv)
        v = dense("v")(kv)
        scale = 1.0 / math.sqrt(Dh)
        B, T = x.shape[0], x.shape[1]
        same_len = kv is x or kv.shape[1] == T
        if (self.dropout == 0.0 and key_padding_mask is not None
                and same_len):
            # fused Pallas path (falls back to jnp off-TPU); padding masks
            # are contiguous so a per-row length is sufficient
            from ctts_tpu.ops.attention import fused_attention
            lengths = jnp.sum(~key_padding_mask, axis=1).astype(jnp.int32)
            lengths = jnp.repeat(lengths, H, axis=0)
            fold = lambda t: t.transpose(0, 2, 1, 3).reshape(  # noqa: E731
                B * H, -1, Dh)
            out = fused_attention(fold(q), fold(k), fold(v), lengths,
                                  scale=scale)
            out = out.reshape(B, H, T, Dh).transpose(0, 2, 1, 3)
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
            if key_padding_mask is not None:
                logits = jnp.where(key_padding_mask[:, None, None, :],
                                   jnp.asarray(-1e9, logits.dtype), logits)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            probs = probs.astype(self.dtype)
            if self.dropout > 0.0:
                probs = nn.Dropout(self.dropout)(probs,
                                                 deterministic=deterministic)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = nn.DenseGeneral(C, axis=(-2, -1), use_bias=self.use_bias,
                              dtype=self.dtype, param_dtype=jnp.float32,
                              kernel_init=nn.initializers.xavier_uniform(),
                              name="out")(out)
        return out


def token_embedding(num_embeddings, features, name="embed_tokens"):
    """Embedding with N(0, d^-0.5) init and zero pad row (blocks.py:10-15)."""
    def init(key, shape, dtype):
        w = jax.random.normal(key, shape, dtype) * (features ** -0.5)
        return w.at[0].set(0.0)
    return nn.Embed(num_embeddings, features, embedding_init=init, name=name)

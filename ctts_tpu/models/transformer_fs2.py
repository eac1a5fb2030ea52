"""`transformer_fs2` block: pre-LN self-attention + conv-FFN FFT stack.

TPU-native rework of the reference's default encoder/decoder
(model/transformers/transformer_fs2.py): same math — pre-LN MHA (no qkv
bias), 9-wide conv FFN with 4×H channels, gelu, the k^-0.5 FFN scale, final
LayerNorm, and non-padding re-masking after every layer — but batch-major,
dtype-parameterized and free of the reference's T×B×C transposes and its
undefined-`utils.softmax` fallback path (transformer_fs2.py:509).
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ctts_tpu.models.blocks import (LayerNorm, MultiHeadAttention, Conv1d,
                                    SinusoidalPositionalEmbedding,
                                    token_embedding)
from ctts_tpu.text.symbols import symbols


class FFNLayer(nn.Module):
    """Conv(k)→gelu→Linear FFN with k^-0.5 scale (transformer_fs2.py:203-239)."""
    hidden: int
    filter_size: int
    kernel_size: int
    dropout: float
    padding: str = "SAME"
    act: str = "gelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = Conv1d(self.filter_size, self.kernel_size, padding=self.padding,
                   dtype=self.dtype, name="ffn_1")(x)
        x = x * self.kernel_size ** -0.5
        if self.act == "gelu":
            x = nn.gelu(x, approximate=False)
        elif self.act == "relu":
            x = nn.relu(x)
        elif self.act == "swish":
            x = nn.swish(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name="ffn_2")(x)
        return x


class EncSALayer(nn.Module):
    """Pre-LN self-attention + FFN with residuals and non-pad masking
    (transformer_fs2.py:154-200)."""
    hidden: int
    num_heads: int
    dropout: float
    kernel_size: int
    padding: str = "SAME"
    act: str = "gelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True):
        nonpad = (~padding_mask)[..., None].astype(x.dtype)
        if self.num_heads > 0:
            residual = x
            x = LayerNorm(dtype=self.dtype, name="layer_norm1")(x)
            x = MultiHeadAttention(self.num_heads, dropout=0.0,
                                   dtype=self.dtype, name="self_attn")(
                x, key_padding_mask=padding_mask,
                deterministic=deterministic)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = (residual + x) * nonpad
        residual = x
        x = LayerNorm(dtype=self.dtype, name="layer_norm2")(x)
        x = FFNLayer(self.hidden, 4 * self.hidden, self.kernel_size,
                     self.dropout, padding=self.padding, act=self.act,
                     dtype=self.dtype, name="ffn")(x, deterministic)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = (residual + x) * nonpad
        return x


class FFTBlocks(nn.Module):
    """Stack of EncSALayers with optional positional embedding + final LN
    (transformer_fs2.py:16-72)."""
    hidden: int
    num_layers: int
    num_heads: int = 2
    ffn_kernel_size: int = 9
    dropout: float = 0.1
    use_pos_embed: bool = True
    use_last_norm: bool = True
    max_seq_len: int = 2000
    padding: str = "SAME"
    act: str = "gelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True):
        nonpad = (~padding_mask)[..., None].astype(x.dtype)
        if self.use_pos_embed:
            alpha = self.param("pos_embed_alpha",
                               nn.initializers.ones, (1,), jnp.float32)
            pos = SinusoidalPositionalEmbedding(
                self.hidden, self.max_seq_len, self.dtype)(padding_mask)
            x = x + alpha * pos
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = x * nonpad
        for i in range(self.num_layers):
            x = EncSALayer(self.hidden, self.num_heads, self.dropout,
                           self.ffn_kernel_size, padding=self.padding,
                           act=self.act, dtype=self.dtype,
                           name=f"layers_{i}")(x, padding_mask,
                                               deterministic) * nonpad
        if self.use_last_norm:
            x = LayerNorm(dtype=self.dtype, name="layer_norm")(x) * nonpad
        return x


class TextEncoder(nn.Module):
    """Token embedding (×√H) + positions + FFT stack
    (transformer_fs2.py:75-119). Returns (hidden, token_embeddings)."""
    config: dict

    @nn.compact
    def __call__(self, txt_tokens, padding_mask, deterministic=True):
        cfg = self.config["transformer_fs2"]
        hidden = cfg["encoder_hidden"]
        dtype = _dtype_of(self.config)
        embed = token_embedding(len(symbols) + 1, hidden)
        txt_embs = embed(txt_tokens) * (hidden ** 0.5)
        pos = SinusoidalPositionalEmbedding(
            hidden, self.config["max_seq_len"], dtype)(padding_mask)
        x = txt_embs + pos
        x = nn.Dropout(cfg["encoder_dropout"])(x, deterministic=deterministic)
        x = FFTBlocks(hidden, cfg["encoder_layer"],
                      num_heads=cfg["encoder_head"],
                      ffn_kernel_size=cfg["ffn_kernel_size"],
                      dropout=cfg["encoder_dropout"], use_pos_embed=False,
                      max_seq_len=self.config["max_seq_len"] * 2,
                      padding=self.config["variance_predictor"]["ffn_padding"],
                      act=self.config["variance_predictor"]["ffn_act"],
                      dtype=dtype, name="fft")(
            x.astype(dtype), padding_mask, deterministic)
        return x.astype(jnp.float32), txt_embs

    @property
    def d_model(self):
        return self.config["transformer_fs2"]["encoder_hidden"]


class Decoder(nn.Module):
    """Frame-level FFT stack with its own positional embedding
    (transformer_fs2.py:122-134)."""
    config: dict

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True):
        cfg = self.config["transformer_fs2"]
        dtype = _dtype_of(self.config)
        x = FFTBlocks(cfg["decoder_hidden"], cfg["decoder_layer"],
                      num_heads=cfg["decoder_head"],
                      ffn_kernel_size=cfg["ffn_kernel_size"],
                      dropout=cfg["decoder_dropout"], use_pos_embed=True,
                      max_seq_len=self.config["max_seq_len"] * 2,
                      padding=self.config["variance_predictor"]["ffn_padding"],
                      act=self.config["variance_predictor"]["ffn_act"],
                      dtype=dtype, name="fft")(
            x.astype(dtype), padding_mask, deterministic)
        return x.astype(jnp.float32), padding_mask

    @property
    def d_model(self):
        return self.config["transformer_fs2"]["decoder_hidden"]


def _dtype_of(model_config):
    return jnp.bfloat16 if model_config.get("compute_dtype") == "bfloat16" \
        else jnp.float32

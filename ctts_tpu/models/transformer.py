"""`transformer` block: classic FastSpeech2 FFT stack (post-LN).

Re-design of the reference classic block (model/transformers/transformer.py):
post-LN multi-head attention + two-conv position-wise FFN (k=[9,1], 1024
channels), absolute sinusoid position table added to the input, output
re-masked after attention and FFN. Decoder truncates to max_seq_len in
training (transformer.py:137-145) — here sequences are already capped by the
static batch shapes, so truncation is a no-op by construction.
"""

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ctts_tpu.models.blocks import Conv1d
from ctts_tpu.text.symbols import symbols


def _sinusoid_encoding(n_position, d_hid):
    """Classic per-dimension sinusoid table (blocks.py:26-46): sin on even
    dims, cos on odd dims (interleaved, unlike the fs2 concat layout)."""
    pos = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000.0, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return jnp.asarray(table)


class _MHA(nn.Module):
    """Post-LN MHA with separate q/k/v Xavier projections
    (transformer.py:181-230)."""
    n_head: int
    d_model: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True):
        dh = self.d_model // self.n_head
        residual = x
        init = nn.initializers.xavier_uniform()
        def proj(name):
            # reference projections are LinearNorm with bias=False
            # (transformer.py:191-198, blocks.py:159-172)
            return nn.DenseGeneral((self.n_head, dh), use_bias=False,
                                   dtype=self.dtype, param_dtype=jnp.float32,
                                   kernel_init=init, name=name)
        q, k, v = proj("w_qs")(x), proj("w_ks")(x), proj("w_vs")(x)
        from ctts_tpu.ops.attention import fused_attention
        B, T = x.shape[0], x.shape[1]
        H = self.n_head
        lengths = jnp.repeat(
            jnp.sum(~padding_mask, axis=1).astype(jnp.int32), H, axis=0)
        fold = lambda t: t.transpose(0, 2, 1, 3).reshape(  # noqa: E731
            B * H, T, dh)
        out = fused_attention(fold(q), fold(k), fold(v), lengths,
                              scale=dh ** -0.5)
        out = out.reshape(B, H, T, dh).transpose(0, 2, 1, 3)
        out = nn.DenseGeneral(self.d_model, axis=(-2, -1), use_bias=False,
                              dtype=self.dtype, param_dtype=jnp.float32,
                              kernel_init=init, name="fc")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(
            out + residual)


class _PositionwiseFF(nn.Module):
    """Conv(k0)→relu→Conv(k1) + post-LN (transformer.py:255-288)."""
    d_model: int
    d_inner: int
    kernel: tuple
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        residual = x
        x = Conv1d(self.d_inner, self.kernel[0], dtype=self.dtype,
                   name="w_1")(x)
        x = nn.relu(x)
        x = Conv1d(self.d_model, self.kernel[1], dtype=self.dtype,
                   name="w_2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(
            x + residual)


class FFTBlock(nn.Module):
    n_head: int
    d_model: int
    d_inner: int
    kernel: tuple
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True):
        x = _MHA(self.n_head, self.d_model, self.dropout, self.dtype,
                 name="slf_attn")(x, padding_mask, deterministic)
        x = jnp.where(padding_mask[..., None], 0.0, x)
        x = _PositionwiseFF(self.d_model, self.d_inner, self.kernel,
                            self.dropout, self.dtype,
                            name="pos_ffn")(x, deterministic)
        x = jnp.where(padding_mask[..., None], 0.0, x)
        return x


class TextEncoder(nn.Module):
    """(transformer.py:15-83)"""
    config: dict

    @nn.compact
    def __call__(self, txt_tokens, padding_mask, deterministic=True):
        cfg = self.config["transformer"]
        d_model = cfg["encoder_hidden"]
        dtype = _dtype_of(self.config)
        T = txt_tokens.shape[1]
        embed = nn.Embed(len(symbols) + 1, d_model,
                         embedding_init=nn.initializers.normal(1.0),
                         name="src_word_emb")
        src_word_emb = embed(txt_tokens)
        n_pos = max(self.config["max_seq_len"] + 1, T)
        x = src_word_emb + _sinusoid_encoding(n_pos, d_model)[None, :T]
        x = x.astype(dtype)
        for i in range(cfg["encoder_layer"]):
            x = FFTBlock(cfg["encoder_head"], d_model,
                         cfg["conv_filter_size"],
                         tuple(cfg["conv_kernel_size"]),
                         cfg["encoder_dropout"], dtype,
                         name=f"layer_stack_{i}")(x, padding_mask,
                                                  deterministic)
        return x.astype(jnp.float32), src_word_emb

    @property
    def d_model(self):
        return self.config["transformer"]["encoder_hidden"]


class Decoder(nn.Module):
    """(transformer.py:86-154)"""
    config: dict

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True):
        cfg = self.config["transformer"]
        d_model = cfg["decoder_hidden"]
        dtype = _dtype_of(self.config)
        T = x.shape[1]
        n_pos = max(self.config["max_seq_len"] + 1, T)
        x = x + _sinusoid_encoding(n_pos, d_model)[None, :T]
        x = x.astype(dtype)
        for i in range(cfg["decoder_layer"]):
            x = FFTBlock(cfg["decoder_head"], d_model,
                         cfg["conv_filter_size"],
                         tuple(cfg["conv_kernel_size"]),
                         cfg["decoder_dropout"], dtype,
                         name=f"layer_stack_{i}")(x, padding_mask,
                                                  deterministic)
        return x.astype(jnp.float32), padding_mask

    @property
    def d_model(self):
        return self.config["transformer"]["decoder_hidden"]


def _dtype_of(model_config):
    return jnp.bfloat16 if model_config.get("compute_dtype") == "bfloat16" \
        else jnp.float32

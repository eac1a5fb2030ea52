"""`fastformer` block: additive attention, O(T) (wuch15's formulation).

Re-design of the reference (model/transformers/fastformer.py): pre-norm
layers of FastAttention + conv position-wise FFN, with the q/k attention-
logit projections WEIGHT-TIED across layers (fastformer.py:157-161). Keeps
the reference's inverted head convention (heads = H // n_head of size
n_head — fastformer.py:271-274) for checkpoint parity. Hyperparameters come
from the "transformer" config section exactly like the reference
(fastformer.py:24-33); the dead code after return (fastformer.py:173-183) is
not reproduced.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ctts_tpu.models.lstransformer import _GeluFF
from ctts_tpu.models.transformer import _sinusoid_encoding, _dtype_of
from ctts_tpu.text.symbols import symbols


class FastAttention(nn.Module):
    """Additive attention (fastformer.py:256-345)."""
    dim: int
    n_head: int                   # config heads; actual heads = dim // n_head
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask, q_logits, k_logits,
                 deterministic=True):
        head_size = self.n_head
        num_heads = self.dim // self.n_head
        B, T, _ = x.shape
        neg = jnp.where(padding_mask, -10000.0, 0.0)[:, None, :]  # [B,1,T]

        init = nn.initializers.normal(0.02)
        dense = lambda name: nn.Dense(    # noqa: E731
            self.dim, kernel_init=init, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        mixed_q = dense("query")(x)                       # [B, T, H]
        mixed_k = dense("key")(x)

        def heads(v):                                     # [B,T,H]→[B,nh,T,hs]
            return v.reshape(B, T, num_heads, head_size).transpose(0, 2, 1, 3)

        scale = head_size ** -0.5
        q_score = q_logits(mixed_q).transpose(0, 2, 1) * scale + neg
        q_weight = nn.softmax(q_score.astype(jnp.float32),
                              axis=-1).astype(self.dtype)  # [B, nh, T]
        pooled_q = jnp.einsum("bht,bhts->bhs", q_weight, heads(mixed_q))
        pooled_q = pooled_q.reshape(B, 1, self.dim)        # [B,1,H]

        mixed_qk = mixed_k * pooled_q                      # [B, T, H]
        k_score = k_logits(mixed_qk).transpose(0, 2, 1) * scale + neg
        k_weight = nn.softmax(k_score.astype(jnp.float32),
                              axis=-1).astype(self.dtype)
        pooled_k = jnp.einsum("bht,bhts->bhs", k_weight, heads(mixed_qk))

        weighted = (pooled_k[:, :, None, :] * heads(mixed_q))  # [B,nh,T,hs]
        weighted = weighted.transpose(0, 2, 1, 3).reshape(B, T, self.dim)
        out = dense("transform")(weighted) + mixed_q
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class FFTBlock(nn.Module):
    """Pre-norm additive-attention stack with tied logit projections
    (fastformer.py:140-172)."""
    depth: int
    d_model: int
    n_head: int
    d_inner: int
    kernel: tuple
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True):
        num_heads = self.d_model // self.n_head
        init = nn.initializers.normal(0.02)
        # weight-tied across layers (one instance, reused)
        q_logits = nn.Dense(num_heads, kernel_init=init, dtype=self.dtype,
                            param_dtype=jnp.float32, name="to_q_attn_logits")
        k_logits = nn.Dense(num_heads, kernel_init=init, dtype=self.dtype,
                            param_dtype=jnp.float32, name="to_k_attn_logits")
        for i in range(self.depth):
            h = nn.LayerNorm(param_dtype=jnp.float32, dtype=self.dtype,
                             name=f"norm_attn_{i}")(x)
            x = FastAttention(self.d_model, self.n_head, self.dropout,
                              self.dtype, name=f"attn_{i}")(
                h, padding_mask, q_logits, k_logits, deterministic) + x
            x = jnp.where(padding_mask[..., None], 0.0, x)
            h = nn.LayerNorm(param_dtype=jnp.float32, dtype=self.dtype,
                             name=f"norm_ff_{i}")(x)
            # the fastformer file carries its own FFN: conv→gelu→conv→dropout
            # with NO internal residual/LN (fastformer.py:348-376) — the
            # residual is added here, outside the PreNorm wrapper
            x = _GeluFF(self.d_model, self.d_inner, self.kernel,
                        self.dropout, self.dtype,
                        name=f"ff_{i}")(h, deterministic) + x
            x = jnp.where(padding_mask[..., None], 0.0, x)
        return x


def _cfg(model_config):
    # the reference fastformer reads the "transformer" hyperparameter
    # section (fastformer.py:24-33)
    return model_config["transformer"]


class TextEncoder(nn.Module):
    """(fastformer.py:16-70)"""
    config: dict

    @nn.compact
    def __call__(self, txt_tokens, padding_mask, deterministic=True):
        cfg = _cfg(self.config)
        d_model = cfg["encoder_hidden"]
        dtype = _dtype_of(self.config)
        T = txt_tokens.shape[1]
        src_word_emb = nn.Embed(len(symbols) + 1, d_model,
                                embedding_init=nn.initializers.normal(1.0),
                                name="src_word_emb")(txt_tokens)
        n_pos = max(self.config["max_seq_len"] + 1, T)
        x = src_word_emb + _sinusoid_encoding(n_pos, d_model)[None, :T]
        x = FFTBlock(cfg["encoder_layer"], d_model, cfg["encoder_head"],
                     cfg["conv_filter_size"], tuple(cfg["conv_kernel_size"]),
                     cfg["encoder_dropout"], dtype,
                     name="layer_stack")(x.astype(dtype), padding_mask,
                                         deterministic)
        return x.astype(jnp.float32), src_word_emb

    @property
    def d_model(self):
        return _cfg(self.config)["encoder_hidden"]


class Decoder(nn.Module):
    """(fastformer.py:73-125)"""
    config: dict

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True):
        cfg = _cfg(self.config)
        d_model = cfg["decoder_hidden"]
        dtype = _dtype_of(self.config)
        T = x.shape[1]
        n_pos = max(self.config["max_seq_len"] + 1, T)
        x = x + _sinusoid_encoding(n_pos, d_model)[None, :T]
        x = FFTBlock(cfg["decoder_layer"], d_model, cfg["decoder_head"],
                     cfg["conv_filter_size"], tuple(cfg["conv_kernel_size"]),
                     cfg["decoder_dropout"], dtype,
                     name="layer_stack")(x.astype(dtype), padding_mask,
                                         deterministic)
        return x.astype(jnp.float32), padding_mask

    @property
    def d_model(self):
        return _cfg(self.config)["decoder_hidden"]

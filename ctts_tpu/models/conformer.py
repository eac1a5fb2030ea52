"""`conformer` block: Macaron FF + relative-position MHSA + depthwise conv.

Re-design of the reference (model/transformers/conformer.py:162-560): each
block is FF(½) → rel-pos self-attention (Transformer-XL shift) → conv module
(pointwise→GLU→depthwise k31→BN→swish→pointwise) → FF(½) → LayerNorm, with
the padding mask applied at the BLOCK OUTPUT only — the reference's
nn.Sequential wiring never forwards the mask into the attention
(conformer.py:244-246, 337), and we keep that behavior BY DEFAULT for
weight-port parity. Set `conformer.attend_to_padding: false` in the model
config to apply the key-padding mask inside RelativeMultiHeadAttention
(both the fused Pallas path and the jnp fallback) — from-scratch TPU
training should not inherit the reference's missing-mask defect.
"""

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ctts_tpu.models.transformer import _sinusoid_encoding, _dtype_of
from ctts_tpu.ops import relpos_attention
from ctts_tpu.text.symbols import symbols


class FeedForwardModule(nn.Module):
    """LN → Linear(×f) → swish → dropout → Linear → dropout
    (conformer.py:266-297)."""
    dim: int
    expansion: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        init = nn.initializers.xavier_uniform()
        x = nn.LayerNorm(param_dtype=jnp.float32, dtype=self.dtype)(x)
        x = nn.Dense(self.dim * self.expansion, kernel_init=init,
                     dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.swish(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, kernel_init=init, dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class RelativeMultiHeadAttention(nn.Module):
    """Transformer-XL relative attention with u/v biases and the classic
    relative-shift trick (conformer.py:347-431). `key_padding_mask`
    ([B, T] bool, True AT PADDING) is only passed when the config opts out
    of the reference's attend-to-padding behavior."""
    d_model: int
    num_heads: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos_embedding, deterministic=True,
                 key_padding_mask=None):
        B, T, _ = x.shape
        H, Dh = self.num_heads, self.d_model // self.num_heads
        init = nn.initializers.xavier_uniform()
        # all four projections are LinearNorm with bias=False
        # (conformer.py:379-382, blocks.py:162 default)
        proj = lambda name: nn.DenseGeneral(  # noqa: E731
            (H, Dh), use_bias=False, kernel_init=init, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        q = proj("query_proj")(x)                         # [B, T, H, Dh]
        k = proj("key_proj")(x)
        v = proj("value_proj")(x)
        # the pos table is structurally batch-invariant: callers pass the
        # unbroadcast [1, T, D] sinusoid table, so a batch-dependent
        # pos_embedding cannot silently reach the fused kernel's pos[0]
        assert pos_embedding.shape[0] == 1, (
            "pos_embedding must be the unbroadcast [1, T, D] table")
        pos = proj("pos_proj")(pos_embedding)             # [1, T, H, Dh]

        u_bias = self.param("u_bias", init, (H, Dh))
        v_bias = self.param("v_bias", init, (H, Dh))

        if relpos_attention.supported(T):
            # fused Pallas path: no [B, H, T, T] tensor ever reaches HBM
            # (2.1x the XLA graph at B16/H8/T896, incl. its own dropout).
            p_drop = 0.0 if deterministic else self.dropout
            rng = (self.make_rng("dropout") if p_drop > 0.0 else None)
            ctx = relpos_attention.relpos_attention(
                q, k, v, pos[0].transpose(1, 0, 2), u_bias, v_bias,
                1.0 / math.sqrt(self.d_model),
                dropout_p=p_drop, dropout_rng=rng,
                key_padding_mask=key_padding_mask).astype(self.dtype)
        else:
            content = jnp.einsum("bqhd,bkhd->bhqk",
                                 q + u_bias[None, None].astype(q.dtype), k)
            pos_score = jnp.einsum(
                "bqhd,bkhd->bhqk",
                q + v_bias[None, None].astype(q.dtype),
                jnp.broadcast_to(pos, q.shape))
            pos_score = self._relative_shift(pos_score)
            score = (content + pos_score) / math.sqrt(self.d_model)
            if key_padding_mask is not None:
                score = jnp.where(key_padding_mask[:, None, None, :],
                                  -1e9, score)
            attn = nn.softmax(score.astype(jnp.float32),
                              axis=-1).astype(self.dtype)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        return nn.DenseGeneral(self.d_model, axis=(-2, -1), use_bias=False,
                               kernel_init=init, dtype=self.dtype,
                               param_dtype=jnp.float32,
                               name="out_proj")(ctx)

    @staticmethod
    def _relative_shift(pos_score):
        B, H, T1, T2 = pos_score.shape
        zeros = jnp.zeros((B, H, T1, 1), pos_score.dtype)
        padded = jnp.concatenate([zeros, pos_score], axis=-1)
        padded = padded.reshape(B, H, T2 + 1, T1)
        return padded[:, :, 1:].reshape(B, H, T1, T2)


class ConformerConvModule(nn.Module):
    """LN → pointwise(×2) → GLU → depthwise k31 → BN → swish → pointwise →
    dropout (conformer.py:434-472)."""
    dim: int
    kernel_size: int
    expansion: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True, training=False):
        x = nn.LayerNorm(param_dtype=jnp.float32, dtype=self.dtype)(x)
        x = nn.Dense(self.dim * self.expansion, dtype=self.dtype,
                     param_dtype=jnp.float32, name="pw1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)                             # GLU
        k = self.kernel_size
        x = nn.Conv(self.dim, (k,), feature_group_count=self.dim,
                    padding=[((k - 1) // 2, (k - 1) // 2)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="dw")(x)
        x = nn.BatchNorm(use_running_average=not training,
                         param_dtype=jnp.float32, dtype=self.dtype,
                         name="bn")(x)
        x = nn.swish(x)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="pw2")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class ConformerBlock(nn.Module):
    """(conformer.py:162-246)"""
    dim: int
    num_heads: int
    ff_expansion: int
    conv_expansion: int
    conv_kernel_size: int
    dropout: float
    half_step_residual: bool = True
    dtype: Any = jnp.float32

    attend_to_padding: bool = True

    @nn.compact
    def __call__(self, x, padding_mask, pos_embedding, deterministic=True,
                 training=False):
        f = 0.5 if self.half_step_residual else 1.0
        x = x + f * FeedForwardModule(self.dim, self.ff_expansion,
                                      self.dropout, self.dtype,
                                      name="ff1")(x, deterministic)
        h = nn.LayerNorm(param_dtype=jnp.float32, dtype=self.dtype,
                         name="attn_norm")(x)
        h = RelativeMultiHeadAttention(self.dim, self.num_heads, self.dropout,
                                       self.dtype, name="attn")(
            h, pos_embedding, deterministic,
            key_padding_mask=None if self.attend_to_padding
            else padding_mask)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = x + ConformerConvModule(self.dim, self.conv_kernel_size,
                                    self.conv_expansion, self.dropout,
                                    self.dtype, name="conv")(
            x, deterministic, training)
        x = x + f * FeedForwardModule(self.dim, self.ff_expansion,
                                      self.dropout, self.dtype,
                                      name="ff2")(x, deterministic)
        x = nn.LayerNorm(param_dtype=jnp.float32, dtype=self.dtype,
                         name="final_norm")(x)
        return jnp.where(padding_mask[..., None], 0.0, x)


class _Stack(nn.Module):
    config: dict
    side: str                    # "encoder" | "decoder"

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True):
        cfg = self.config["conformer"]
        dtype = _dtype_of(self.config)
        d_model = cfg[f"{self.side}_hidden"]
        T = x.shape[1]
        n_pos = max(self.config["max_seq_len"] + 1, T)
        pos_table = _sinusoid_encoding(n_pos, d_model)[None, :T]
        x = (x + pos_table).astype(dtype)
        # keep the pos table unbroadcast ([1, T, D]) — the fused attention
        # relies on batch invariance, and this makes it structural
        pos_embedding = pos_table.astype(dtype)
        for i in range(cfg[f"{self.side}_layer"]):
            x = ConformerBlock(
                d_model, cfg[f"{self.side}_head"],
                cfg["feed_forward_expansion_factor"],
                cfg["conv_expansion_factor"], cfg["conv_kernel_size"],
                cfg[f"{self.side}_dropout"], cfg["half_step_residual"],
                dtype, cfg.get("attend_to_padding", True),
                name=f"layer_stack_{i}")(
                x, padding_mask, pos_embedding, deterministic,
                training=not deterministic)
        return x.astype(jnp.float32)


class TextEncoder(nn.Module):
    """(conformer.py:20-88)"""
    config: dict

    @nn.compact
    def __call__(self, txt_tokens, padding_mask, deterministic=True):
        d_model = self.config["conformer"]["encoder_hidden"]
        src_word_emb = nn.Embed(len(symbols) + 1, d_model,
                                embedding_init=nn.initializers.normal(1.0),
                                name="src_word_emb")(txt_tokens)
        x = _Stack(self.config, "encoder", name="stack")(
            src_word_emb, padding_mask, deterministic)
        return x, src_word_emb

    @property
    def d_model(self):
        return self.config["conformer"]["encoder_hidden"]


class Decoder(nn.Module):
    """(conformer.py:91-159)"""
    config: dict

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True):
        x = _Stack(self.config, "decoder", name="stack")(
            x, padding_mask, deterministic)
        return x, padding_mask

    @property
    def d_model(self):
        return self.config["conformer"]["decoder_hidden"]

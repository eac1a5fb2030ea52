"""`lstransformer` block: Long-Short Transformer attention, O(T·(w + r)).

Re-design of the reference (model/transformers/lstransformer.py): windowed
local attention (window 128, look-back 1 window) + dynamic-projection global
KV (segment 16, rank r=1), rotary position embedding on q/kv, shared KV,
causal=True (the reference's default, lstransformer.py:178), pre-norm layers
with conv FFN. Hyperparameters come from the "transformer" section like the
reference (lstransformer.py:59-69).

Deviation from the reference (documented latent bug, not replicated by
default): the reference passes the PADDING mask (True at pad) into
attention code that expects a VALIDITY mask (True at valid) —
lstransformer.py:322,334,358 mask out valid tokens. Here padding positions
are masked out, as intended. Setting `lstransformer.replicate_mask_bug:
true` in the model config flips the convention back to the reference's
inverted behavior, which is what full-model ported-weight parity tests
pin (tests/test_parity_blocks.py) — proving the weight port and every
other computation line up bit-for-bit with the reference stack. The dead
code after return (lstransformer.py:205-215) is not reproduced.
"""

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ctts_tpu.models.transformer import _sinusoid_encoding, _dtype_of
from ctts_tpu.text.symbols import symbols

NEG = -1e9


def _lcm(a, b):
    return a * b // math.gcd(a, b)


def rotary_freqs(positions, dim_head):
    """rotary_embedding_torch convention: interleaved-pair frequencies."""
    inv = 1.0 / (10000 ** (jnp.arange(0, dim_head, 2) / dim_head))
    freqs = positions[:, None] * inv[None, :]              # [T, d/2]
    return jnp.repeat(freqs, 2, axis=-1)                   # [T, d]


def apply_rotary(freqs, t):
    """t: [..., T, d]; freqs: [T, d]. Interleaved rotate-half."""
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    t1 = t * cos
    # rotate_half with interleaved pairs: (x0,x1,x2,x3) → (-x1,x0,-x3,x2)
    x = t.reshape(*t.shape[:-1], -1, 2)
    rot = jnp.stack([-x[..., 1], x[..., 0]], axis=-1).reshape(t.shape)
    return t1 + rot * sin


def look_around(x, backward=1, forward=0, pad_value=0.0):
    """[B, W, n, ...] → concat of shifted windows along axis 2
    (lstransformer.py:43-48)."""
    W = x.shape[1]
    pads = [(0, 0)] * x.ndim
    pads[1] = (backward, forward)
    padded = jnp.pad(x, pads, constant_values=pad_value)
    return jnp.concatenate(
        [padded[:, i: i + W] for i in range(backward + forward + 1)], axis=2)


class LongShortAttention(nn.Module):
    """(lstransformer.py:218-394)"""
    dim: int
    dim_head: int
    heads: int
    window_size: int = 128
    segment_size: int = 16
    r: int = 1
    causal: bool = True
    dropout: float = 0.0
    dtype: Any = jnp.float32
    mask_parity: bool = False      # replicate the reference's inverted mask

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True):
        B, n, _ = x.shape
        h, w, s, r = self.heads, self.window_size, self.segment_size, self.r
        inner = h * self.dim_head
        mult = _lcm(w, s) if self.causal else w
        pad_len = (-n) % mult
        N = n + pad_len

        # True at tokens; parity mode feeds the padding mask straight in as
        # validity, exactly like the reference stack (lstransformer.py:
        # 322,334,358 treat the True-at-padding mask as True-at-valid)
        valid = padding_mask if self.mask_parity else ~padding_mask
        if pad_len:
            x = jnp.pad(x, ((0, 0), (0, pad_len), (0, 0)))
            valid = jnp.pad(valid, ((0, 0), (0, pad_len)))

        init = nn.initializers.xavier_uniform()
        q = nn.Dense(inner, use_bias=False, kernel_init=init,
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="to_q")(x)
        kv = nn.Dense(inner, use_bias=False, kernel_init=init,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="to_kv")(x)

        def split_heads(t):                                 # [B,N,h*d]→[B*h,N,d]
            return t.reshape(B, N, h, self.dim_head).transpose(
                0, 2, 1, 3).reshape(B * h, N, self.dim_head)

        q, kv = split_heads(q), split_heads(kv)
        seq = jnp.arange(N, dtype=jnp.float32)
        freqs = rotary_freqs(seq, self.dim_head).astype(q.dtype)
        q = apply_rotary(freqs, q) * self.dim_head ** -0.5
        kv = apply_rotary(freqs, kv)

        windows = N // w
        hvalid = jnp.repeat(valid, h, axis=0)               # [B*h, N]

        # ---- local windowed attention with look-back ----
        lq = q.reshape(B * h, windows, w, self.dim_head)
        lkv = kv.reshape(B * h, windows, w, self.dim_head)
        fwd = 0 if self.causal else 1
        lkv = look_around(lkv, backward=1, forward=fwd)
        lkv = nn.LayerNorm(param_dtype=jnp.float32, dtype=self.dtype,
                           name="local_norm")(lkv)
        lsim = jnp.einsum("bwid,bwjd->bwij", lq, lkv)       # [Bh,W,w,(1+f+1)w]

        lmask = hvalid.reshape(B * h, windows, w)
        lmask = look_around(lmask, backward=1, forward=fwd, pad_value=False)
        lsim = jnp.where(lmask[:, :, None, :], lsim, NEG)
        # mask out the synthetic look-around padding (positions < 0)
        srw = jnp.arange(N).reshape(1, windows, w)
        pad_mask = look_around(srw, backward=1, forward=fwd,
                               pad_value=-1) == -1
        lsim = jnp.where(pad_mask[:, :, None, :], NEG, lsim)

        # ---- global low-rank KV ----
        proj = nn.Dense(r, use_bias=False, kernel_init=init,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="to_dynamic_proj")
        if self.causal:
            n_seg = N // s
            gkv = kv.reshape(B * h, n_seg, s, self.dim_head)
            pkv = proj(gkv)                                 # [Bh, n_seg, s, r]
            segmask = hvalid.reshape(B * h, n_seg, s)
            pkv = jnp.where(segmask[..., None], pkv, NEG)
            pkv = nn.softmax(pkv.astype(jnp.float32), axis=-2).astype(self.dtype)
            gkv = jnp.einsum("bnsd,bnsr->bnrd", gkv, pkv)
            gkv = gkv.reshape(B * h, n_seg * r, self.dim_head)
            G = n_seg * r
        else:
            pkv = proj(kv)                                  # [Bh, N, r]
            pkv = jnp.where(hvalid[..., None], pkv, NEG)
            pkv = nn.softmax(pkv.astype(jnp.float32), axis=-2).astype(self.dtype)
            gkv = jnp.einsum("bnd,bnr->brd", kv, pkv)
            G = r
        gkv = nn.LayerNorm(param_dtype=jnp.float32, dtype=self.dtype,
                           name="global_norm")(gkv)
        gsim = jnp.einsum("bnd,brd->bnr", q, gkv)           # [Bh, N, G]

        # ---- causal masks ----
        if self.causal:
            g_max = seq.reshape(-1, s).max(axis=-1)         # [n_seg]
            g_max = jnp.repeat(g_max, r)                    # [G]
            g_mask = seq[:, None] >= g_max[None, :]
            gsim = jnp.where(g_mask[None], gsim, NEG)
            i, j = lsim.shape[-2], lsim.shape[-1]
            causal_mask = jnp.triu(jnp.ones((i, j), bool), j - i + 1)
            lsim = jnp.where(causal_mask[None, None], NEG, lsim)

        # ---- combined softmax over [global | local] keys ----
        gsim = gsim.reshape(B * h, windows, w, G)
        sim = jnp.concatenate([gsim, lsim], axis=-1)
        attn = nn.softmax(sim.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)

        gv = jnp.broadcast_to(gkv[:, None], (B * h, windows, G,
                                             self.dim_head))
        v = jnp.concatenate([gv, lkv], axis=2)              # [Bh,W,G+jw,d]
        out = jnp.einsum("bwij,bwjd->bwid", attn, v)
        out = out.reshape(B, h, N, self.dim_head).transpose(0, 2, 1, 3)
        out = out.reshape(B, N, inner)[:, :n]
        return nn.Dense(self.dim, kernel_init=init, dtype=self.dtype,
                        param_dtype=jnp.float32, name="to_out")(out)


class _GeluFF(nn.Module):
    """Conv(k0)→gelu→Conv(k1), pre-norm residual handled by caller
    (lstransformer.py:397-425 — note: gelu and NO post-LN, unlike the
    classic transformer's FFN)."""
    d_model: int
    d_inner: int
    kernel: tuple
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        from ctts_tpu.models.blocks import Conv1d
        x = Conv1d(self.d_inner, self.kernel[0], dtype=self.dtype,
                   name="w_1")(x)
        x = nn.gelu(x, approximate=False)
        x = Conv1d(self.d_model, self.kernel[1], dtype=self.dtype,
                   name="w_2")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class FFTBlock(nn.Module):
    """Pre-norm attention + FFN stack (lstransformer.py:175-204)."""
    depth: int
    d_model: int
    n_head: int
    d_inner: int
    kernel: tuple
    dropout: float
    window_size: int = 128
    segment_size: int = 16
    r: int = 1
    dtype: Any = jnp.float32
    mask_parity: bool = False

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True):
        d_head = self.d_model // self.n_head
        for i in range(self.depth):
            h = nn.LayerNorm(param_dtype=jnp.float32, dtype=self.dtype,
                             name=f"norm_attn_{i}")(x)
            x = LongShortAttention(
                self.d_model, d_head, self.n_head,
                window_size=self.window_size, segment_size=self.segment_size,
                r=self.r, dropout=self.dropout, dtype=self.dtype,
                mask_parity=self.mask_parity,
                name=f"attn_{i}")(h, padding_mask, deterministic) + x
            x = jnp.where(padding_mask[..., None], 0.0, x)
            h = nn.LayerNorm(param_dtype=jnp.float32, dtype=self.dtype,
                             name=f"norm_ff_{i}")(x)
            x = _GeluFF(self.d_model, self.d_inner, self.kernel,
                        self.dropout, self.dtype,
                        name=f"ff_{i}")(h, deterministic) + x
            x = jnp.where(padding_mask[..., None], 0.0, x)
        return x


def _cfg(model_config):
    # the reference lstransformer reads the "transformer" section
    # (lstransformer.py:59-69)
    return model_config["transformer"]


def _mask_parity(model_config):
    return model_config.get("lstransformer", {}).get(
        "replicate_mask_bug", False)


class TextEncoder(nn.Module):
    """(lstransformer.py:51-105)"""
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
                     cfg["encoder_dropout"], dtype=dtype,
                     mask_parity=_mask_parity(self.config),
                     name="layer_stack")(x.astype(dtype), padding_mask,
                                         deterministic)
        return x.astype(jnp.float32), src_word_emb

    @property
    def d_model(self):
        return _cfg(self.config)["encoder_hidden"]


class Decoder(nn.Module):
    """(lstransformer.py:108-161)"""
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
                     cfg["decoder_dropout"], dtype=dtype,
                     mask_parity=_mask_parity(self.config),
                     name="layer_stack")(x.astype(dtype), padding_mask,
                                         deterministic)
        return x.astype(jnp.float32), padding_mask

    @property
    def d_model(self):
        return _cfg(self.config)["decoder_hidden"]

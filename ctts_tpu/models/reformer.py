"""`reformer` block: LSH bucketed attention + local heads + two-stream
residuals (reversible-style math, plain autodiff storage).

Re-design of the reference (model/transformers/reformer.py): shared-QK LSH
attention with 4 hash rounds over bucket-64 chunks with look-one-back
(reformer.py:304-563), 4 of 8 heads using windowed local attention
(reformer.py:643, window = 2·bucket, causal, shared QK), weight tying of the
attention/FFN across all depth levels (reformer.py:946-947, weight_tie=True),
the doubled-feature two-stream residual scheme with final averaging
(reformer.py:974-977), and causal=True like the reference instantiation
(reformer.py:164-168). Sequences are padded to a multiple of 2·bucket
(Autopadder, reformer.py:889-928).

TPU choices: reversibility is NOT reproduced — its only purpose is
activation memory, and at TTS sequence lengths (N <= ~2k, d=256) plain
autodiff storage is a few hundred MB on a 16 GB chip, so the two-stream
residual math is kept but gradients use stored activations (2x-fwd
recompute would cost ~35 ms/step for nothing; `jax.checkpoint` can be
added around the depth loop if memory ever binds). The FFN is a plain
dense gelu block (time-chunking likewise obsolete). Sort-domain
gather/unsort runs on the MXU via ops/sort_gather.py. Deviation from a
reference defect: the reference drops the padding mask on the floor (it is
passed as `mask=` but the attention only reads `input_mask=`), so its LSH
attends to padding; here padding is masked out properly.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctts_tpu.models.transformer import _sinusoid_encoding, _dtype_of
from ctts_tpu.ops import local_window_attention, lsh_chunk_attention, \
    sort_gather
from ctts_tpu.text.symbols import symbols

NEG = -1e9
SELF_ATTN_VAL = -5e4        # attend to self only when nothing else matches


def _take(x, idx):
    """Batched gather along axis 1: x [B, N, ...], idx [B, M]."""
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)


def _look_one_back(x):
    extra = jnp.concatenate([x[:, -1:], x[:, :-1]], axis=1)
    return jnp.concatenate([x, extra], axis=2)


def lsh_attention(qk, v, valid, rng, bucket_size=64, n_hashes=4,
                  causal=True, dtype=jnp.float32, rot=None):
    """Shared-QK LSH attention (reformer.py:304-563).

    qk, v: [B, N, d]; valid: [B, N] bool. N must be a multiple of
    2·bucket_size. Returns [B, N, d]. `rot` optionally overrides the random
    hash rotations [1, d, n_hashes, n_buckets//2] (used by parity tests to
    drive both frameworks with identical hashes).
    """
    B, N, d = qk.shape
    n_buckets = N // bucket_size
    assert N % (bucket_size * 2) == 0

    # --- hashing: one random rotation set per round ---
    if rot is None:
        rot = jax.random.normal(rng, (1, d, n_hashes, n_buckets // 2),
                                qk.dtype)
    else:
        rot = jnp.asarray(rot, qk.dtype)
    rotated = jnp.einsum("btf,bfhi->bhti",
                         qk, jnp.broadcast_to(rot, (B, d, n_hashes,
                                                    n_buckets // 2)))
    rotated = jnp.concatenate([rotated, -rotated], axis=-1)
    buckets = jnp.argmax(rotated, axis=-1)                # [B, h, N]
    offsets = (jnp.arange(n_hashes) * n_buckets)[None, :, None]
    buckets = (buckets + offsets).reshape(B, n_hashes * N)

    # --- sort by (bucket, position) ---
    ticker = jnp.broadcast_to(jnp.arange(n_hashes * N)[None],
                              (B, n_hashes * N))
    buckets_and_t = N * buckets + (ticker % N)

    # XLA's take_along_axis gather is a serial per-index loop on TPU
    # (2.84 ms for ONE of these at B64/N896/d32); route all sort-domain
    # moves through the one-hot-matmul kernels instead. The fast path
    # additionally (a) carries the validity bits through a 3-operand
    # stable sort (argsort IS sort_key_val over an iota, so adding the
    # bits costs one more sort operand, not a gather), and (b) un-sorts
    # by SCATTERING along `sticker`, so the second argsort (undo_sort)
    # is never built.
    fast = sort_gather.supported(N, n_hashes * N, 2 * d)
    if fast:
        valid4 = jnp.tile(valid.astype(jnp.int32), (1, n_hashes))
        _, sticker, svalid = jax.lax.sort(
            (buckets_and_t, ticker, valid4), dimension=-1, num_keys=1,
            is_stable=True)
        st = sticker % N                                  # source positions
        if lsh_chunk_attention.supported(N, bucket_size, d, n_hashes):
            # fully fused sorted domain: the gather, look-one-back
            # attention and logsumexp never leave VMEM; only the un-sort
            # scatter and the hash-round combine stay in XLA
            out = lsh_chunk_attention.chunk_attention(
                qk, v, st, svalid, valid, bucket_size, causal, d ** -0.5)
            unsorted = sort_gather.scatter_rows(out, sticker, n_hashes * N)
            o = unsorted[..., :d].reshape(B, n_hashes, N, d)
            logits = unsorted[..., d].reshape(B, n_hashes, N, 1)
            w = jnp.exp(logits - jax.nn.logsumexp(logits, axis=1,
                                                  keepdims=True))
            return jnp.sum(o * w, axis=1)
        saug = sort_gather.gather_rows(jnp.concatenate([qk, v], -1), st)
        sqk = saug[..., :d]
        sv = saug[..., d:]
    else:
        sticker = jnp.argsort(buckets_and_t, axis=-1, stable=True)
        undo_sort = jnp.argsort(sticker, axis=-1, stable=True)
        st = sticker % N
        sqk = _take(qk, st)
        sv = _take(v, st)

    n_chunks = n_hashes * n_buckets
    bq_t = st.reshape(B, n_chunks, -1)
    bqk = sqk.reshape(B, n_chunks, -1, d)
    bv = sv.reshape(B, n_chunks, -1, d)

    bq = bqk
    # rsqrt-normalize (NaN-safe on zero padding vectors)
    bk = bqk * jax.lax.rsqrt(
        jnp.sum(bqk * bqk, axis=-1, keepdims=True) + 1e-12)
    bk = _look_one_back(bk)
    bv = _look_one_back(bv)
    bkv_t = _look_one_back(bq_t[..., None])[..., 0]

    dots = jnp.einsum("bhie,bhje->bhij", bq, bk) * (d ** -0.5)

    # padding mask (the fast path already sorted the bits)
    if fast:
        mq = svalid > 0
    else:
        mq = _take(valid[..., None].astype(jnp.int32), st)[..., 0] > 0
    mq = mq.reshape(B, n_chunks, -1)
    mkv = _look_one_back(mq[..., None])[..., 0]
    dots = jnp.where(mq[:, :, :, None] & mkv[:, :, None, :], dots, NEG)

    if causal:
        dots = jnp.where(bq_t[:, :, :, None] < bkv_t[:, :, None, :], NEG,
                         dots)
    # attention to self only as a last resort (shared QK)
    dots = jnp.where(bq_t[:, :, :, None] == bkv_t[:, :, None, :],
                     SELF_ATTN_VAL, dots)

    dots_lse = jax.nn.logsumexp(dots, axis=-1, keepdims=True)
    probs = jnp.exp(dots - dots_lse)
    bo = jnp.einsum("buij,buje->buie", probs, bv)
    so = bo.reshape(B, -1, d)
    slogits = dots_lse.reshape(B, -1)

    if fast:
        unsorted = sort_gather.scatter_rows(
            jnp.concatenate([so, slogits[..., None]], axis=-1),
            sticker, n_hashes * N)
        o = unsorted[..., :d]
        logits = unsorted[..., d]
    else:
        o = _take(so, undo_sort)
        logits = jnp.take_along_axis(slogits, undo_sort, axis=1)
    o = o.reshape(B, n_hashes, N, d)
    logits = logits.reshape(B, n_hashes, N, 1)
    # combine hash rounds by their log-normalizers
    w = jnp.exp(logits - jax.nn.logsumexp(logits, axis=1, keepdims=True))
    return jnp.sum(o * w, axis=1)


def _look_back_padded(x, pad_value):
    """[B, W, n, ...] → concat [current window, previous window] along axis
    2, with window 0's look-back SYNTHETIC (pad_value), like the
    local-attention library — NOT wrapped like the LSH sorted domain
    (wrapping double-counts keys when W == 1)."""
    pad = jnp.full_like(x[:, :1], pad_value)
    prev = jnp.concatenate([pad, x[:, :-1]], axis=1)
    return jnp.concatenate([x, prev], axis=2)


def local_attention(qk, v, valid, window, causal=True):
    """Windowed shared-QK attention with one-window look-back
    (the reference's local_attention heads, reformer.py:643)."""
    B, N, d = qk.shape
    assert N % window == 0
    if causal and local_window_attention.supported(N, window, d):
        # fused per-window Pallas kernel; the jnp path below is the
        # oracle (tests/test_sort_gather.py asserts equivalence)
        return local_window_attention.local_window_attention(
            qk, v, valid, window, d ** -0.5)
    W = N // window
    k = qk * jax.lax.rsqrt(jnp.sum(qk * qk, axis=-1, keepdims=True) + 1e-12)
    pos = jnp.broadcast_to(jnp.arange(N)[None], (B, N))

    def windows(x):
        return x.reshape(B, W, window, -1)

    bq = windows(qk)
    bk = _look_back_padded(windows(k), 0.0)
    bv = _look_back_padded(windows(v), 0.0)
    bq_t = windows(pos[..., None])[..., 0]
    bkv_t = _look_back_padded(windows(pos[..., None]), -1)[..., 0]
    mq = windows(valid[..., None].astype(jnp.int32))[..., 0].astype(bool)
    mkv = _look_back_padded(windows(valid[..., None].astype(jnp.int32)),
                            0)[..., 0].astype(bool)
    mkv = mkv & (bkv_t >= 0)                   # synthetic look-back padding

    # mask order matches the local-attention library: self-value first, the
    # validity mask LAST (so fully-masked padded query rows go uniform, not
    # one-hot-on-self). Padded-row content matters: the next layer's LSH
    # SORT interleaves padded with valid positions, so padded garbage must
    # be bit-identical to the reference for deep-stack parity.
    dots = jnp.einsum("bwie,bwje->bwij", bq, bk) * (d ** -0.5)
    dots = jnp.where(bq_t[:, :, :, None] == bkv_t[:, :, None, :],
                     SELF_ATTN_VAL, dots)
    if causal:
        dots = jnp.where(bq_t[:, :, :, None] < bkv_t[:, :, None, :], NEG,
                         dots)
    dots = jnp.where(mq[:, :, :, None] & mkv[:, :, None, :], dots, NEG)
    probs = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum("bwij,bwje->bwie", probs, bv)
    return out.reshape(B, N, d)


class LSHSelfAttention(nn.Module):
    """(reformer.py:610-714): 8 heads — 4 LSH + 4 local, shared QK, one
    value projection."""
    dim: int
    heads: int
    dim_head: int
    bucket_size: int = 64
    n_hashes: int = 4
    n_local_attn_heads: int = 4
    causal: bool = True
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, valid, deterministic=True, lsh_rot=None):
        B, N, _ = x.shape
        h, lh = self.heads, self.n_local_attn_heads
        inner = h * self.dim_head
        init = nn.initializers.xavier_uniform()
        qk = nn.Dense(inner, use_bias=False, kernel_init=init,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="toqk")(x)
        v = nn.Dense(inner, use_bias=False, kernel_init=init,
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="tov")(x)

        def heads_of(t):                                  # [B,N,h·d]→[B,h,N,d]
            return t.reshape(B, N, h, self.dim_head).transpose(0, 2, 1, 3)

        qk, v = heads_of(qk), heads_of(v)
        lqk, qk = qk[:, :lh], qk[:, lh:]
        lv, v = v[:, :lh], v[:, lh:]
        lsh_h = h - lh

        def flat(t, nh):
            return t.reshape(B * nh, N, self.dim_head)

        if self.has_rng("lsh"):
            rng = self.make_rng("lsh")
        else:
            rng = jax.random.PRNGKey(0)
        hvalid_lsh = jnp.repeat(valid, lsh_h, axis=0)
        lsh_out = lsh_attention(flat(qk, lsh_h), flat(v, lsh_h), hvalid_lsh,
                                rng, self.bucket_size, self.n_hashes,
                                self.causal, self.dtype, rot=lsh_rot)
        lsh_out = lsh_out.reshape(B, lsh_h, N, self.dim_head)
        if lh > 0:
            hvalid_loc = jnp.repeat(valid, lh, axis=0)
            loc_out = local_attention(flat(lqk, lh), flat(lv, lh),
                                      hvalid_loc,
                                      window=self.bucket_size * 2,
                                      causal=self.causal)
            loc_out = loc_out.reshape(B, lh, N, self.dim_head)
            out = jnp.concatenate([loc_out, lsh_out], axis=1)
        else:
            out = lsh_out
        out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)
        out = nn.Dense(self.dim, kernel_init=init, dtype=self.dtype,
                       param_dtype=jnp.float32, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class _FF(nn.Module):
    """gelu FFN ×4 (reformer.py:986-1008)."""
    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(self.dim * self.mult, dtype=self.dtype,
                     param_dtype=jnp.float32, name="w1")(x)
        x = nn.gelu(x, approximate=False)   # torch nn.GELU = exact erf
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="w2")(x)


class Reformer(nn.Module):
    """Two-stream residual stack, weight-tied across depth
    (reformer.py:931-977)."""
    dim: int
    depth: int
    heads: int
    dim_head: int
    bucket_size: int = 64
    n_hashes: int = 4
    n_local_attn_heads: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, valid, deterministic=True, lsh_rot=None):
        # weight_tie=True ties attn/ff across depth (reformer.py:946-947),
        # but each depth keeps its OWN PreNorm LayerNorms (the residual
        # wrapper is constructed per layer, reformer.py:952-968)
        attn = LSHSelfAttention(self.dim, self.heads, self.dim_head,
                                self.bucket_size, self.n_hashes,
                                self.n_local_attn_heads, causal=True,
                                dropout=self.dropout, dtype=self.dtype,
                                name="attn")
        ff = _FF(self.dim, dropout=self.dropout, dtype=self.dtype, name="ff")

        # Draw ALL depth layers' hash rotations with ONE threefry call:
        # jax.random.normal costs ~2.3 ms per call on TPU regardless of
        # size at these shapes (dispatch-bound), and per-layer generation
        # inside lsh_attention was ~27 ms/step across 12 layers. Slicing
        # a [depth, ...] draw keeps layers independently hashed (same
        # distribution as the reference's per-call torch.randn).
        layer_rots = [lsh_rot] * self.depth
        if lsh_rot is None:
            key = (self.make_rng("lsh") if self.has_rng("lsh")
                   else jax.random.PRNGKey(0))
            n_buckets = x.shape[1] // self.bucket_size
            rots = jax.random.normal(
                key, (self.depth, 1, self.dim_head, self.n_hashes,
                      n_buckets // 2), self.dtype)
            layer_rots = [rots[i] for i in range(self.depth)]

        x1 = x2 = x
        for i in range(self.depth):
            h = nn.LayerNorm(param_dtype=jnp.float32, dtype=self.dtype,
                             name=f"norm_f_{i}")(x2)
            y1 = x1 + attn(h, valid, deterministic, lsh_rot=layer_rots[i])
            h = nn.LayerNorm(param_dtype=jnp.float32, dtype=self.dtype,
                             name=f"norm_g_{i}")(y1)
            y2 = x2 + ff(h, deterministic)
            x1, x2 = y1, y2
        return (x1 + x2) * 0.5


class _Stack(nn.Module):
    config: dict
    side: str

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True, lsh_rot=None):
        tcfg = self.config["transformer"]
        rcfg = self.config["reformer"]
        d_model = tcfg[f"{self.side}_hidden"]
        dtype = _dtype_of(self.config)
        bucket = rcfg.get("bucket_size", 64)
        B, n, _ = x.shape
        pad_len = (-n) % (bucket * 2)
        valid = ~padding_mask
        if pad_len:
            x = jnp.pad(x, ((0, 0), (0, pad_len), (0, 0)))
            valid = jnp.pad(valid, ((0, 0), (0, pad_len)))
        heads = rcfg[f"{self.side}_head"]
        n_local = min(rcfg.get("n_local_attn_heads", 4), max(heads - 1, 0))
        out = Reformer(
            d_model, rcfg["depth"], heads,
            dim_head=tcfg[f"{self.side}_hidden"] // tcfg[f"{self.side}_head"],
            bucket_size=bucket, n_hashes=rcfg.get("n_hashes", 4),
            n_local_attn_heads=n_local,
            dropout=tcfg[f"{self.side}_dropout"], dtype=dtype,
            name="reformer")(x.astype(dtype), valid, deterministic,
                             lsh_rot=lsh_rot)
        return out[:, :n].astype(jnp.float32)


class TextEncoder(nn.Module):
    """(reformer.py:124-189)"""
    config: dict

    @nn.compact
    def __call__(self, txt_tokens, padding_mask, deterministic=True,
                 lsh_rot=None):
        d_model = self.config["transformer"]["encoder_hidden"]
        T = txt_tokens.shape[1]
        src_word_emb = nn.Embed(len(symbols) + 1, d_model,
                                embedding_init=nn.initializers.normal(1.0),
                                name="src_word_emb")(txt_tokens)
        n_pos = max(self.config["max_seq_len"] + 1, T)
        x = src_word_emb + _sinusoid_encoding(n_pos, d_model)[None, :T]
        x = _Stack(self.config, "encoder", name="stack")(x, padding_mask,
                                                         deterministic,
                                                         lsh_rot=lsh_rot)
        return x, src_word_emb

    @property
    def d_model(self):
        return self.config["transformer"]["encoder_hidden"]


class Decoder(nn.Module):
    """(reformer.py:192-256)"""
    config: dict

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True, lsh_rot=None):
        d_model = self.config["transformer"]["decoder_hidden"]
        T = x.shape[1]
        n_pos = max(self.config["max_seq_len"] + 1, T)
        x = x + _sinusoid_encoding(n_pos, d_model)[None, :T]
        x = _Stack(self.config, "decoder", name="stack")(x, padding_mask,
                                                         deterministic,
                                                         lsh_rot=lsh_rot)
        return x, padding_mask

    @property
    def d_model(self):
        return self.config["transformer"]["decoder_hidden"]

"""Prosody modeling: Du et al. 2021 (GMM-MDN) and Liu et al. 2021
(DelightfulTTS utterance/phoneme prosody).

TPU-native re-design of the reference modules (model/modules.py:151-723):

* DuProsodyExtractor replaces the per-utterance/per-phone Python loop over
  variable-length mel slices (modules.py:186-201) with a SEGMENT-RESET
  bidirectional GRU: one scan over the full mel axis whose hidden state
  resets at phone boundaries (mel2ph changes); each phone's embedding is the
  hidden state at its last (forward) / first (backward) frame. The 2-D conv
  stack has kernel (1, k) — no mixing across time — so running it on the
  whole mel equals running it per-slice.
* The autoregressive GMM-MDN predictor (modules.py:235-329) is a lax.scan.
* Liu et al. reference encoder keeps its strided conv + GRU shape
  (modules.py:332-397) with a CoordConv first layer (coordconv.py), minus
  the reference's hardcoded .cuda() calls.
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctts_tpu.models.blocks import ConvNorm


# --------------------------------------------------------------------- #
# GRU helpers
# --------------------------------------------------------------------- #

class _GRUCellT(nn.Module):
    """GRU cell with torch nn.GRU/GRUCell semantics and weight layout.

    torch computes n = tanh(W_in x + b_in + r * (W_hn h + b_hn)) — the
    hidden bias sits INSIDE the reset-gate product, which flax's GRUCell
    (no hidden bias on n) cannot represent, so reference checkpoints could
    not be ported onto it. Params: wi [in, 3H], wh [H, 3H], bi/bh [3H],
    gate order (r, z, n) — the transpose of torch's weight_ih/weight_hh/
    bias_ih/bias_hh, imported 1:1 by utils/torch_import.py:_gru.
    Init matches torch's uniform(-1/sqrt(H), 1/sqrt(H)).
    """
    hidden: int

    @nn.compact
    def __call__(self, h, x):
        H = self.hidden
        k = 1.0 / math.sqrt(H)

        def uinit(key, shape):
            return jax.random.uniform(key, shape, jnp.float32, -k, k)

        wi = self.param("wi", uinit, (x.shape[-1], 3 * H))
        wh = self.param("wh", uinit, (H, 3 * H))
        bi = self.param("bi", uinit, (3 * H,))
        bh = self.param("bh", uinit, (3 * H,))
        i_r, i_z, i_n = jnp.split(x @ wi + bi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(h @ wh + bh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new


class _ResetGRUCell(nn.Module):
    """GRUCell whose state zeroes where the per-step reset flag is True."""
    hidden: int

    @nn.compact
    def __call__(self, h, inputs):
        x_t, r_t = inputs
        h = jnp.where(r_t[:, None], 0.0, h)
        return _GRUCellT(self.hidden, name="gru")(h, x_t)


class SegmentResetGRU(nn.Module):
    """GRU over [B, T, C] whose state resets where ``reset[b, t]`` is True."""
    hidden: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x, reset):
        B = x.shape[0]
        init = jnp.zeros((B, self.hidden), x.dtype)
        if self.reverse:
            x, reset = x[:, ::-1], reset[:, ::-1]
        scan = nn.scan(_ResetGRUCell, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        _, outs = scan(self.hidden, name="cell")(init, (x, reset))
        if self.reverse:
            outs = outs[:, ::-1]
        return outs                                     # [B, T, H]


class GRU(nn.Module):
    """Plain (optionally bidirectional) GRU; returns (memory, final_state).

    Final states respect per-sequence lengths when given.
    """
    hidden: int
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x, lengths=None):
        B, T, _ = x.shape
        never = jnp.zeros((B, T), bool)
        fwd = SegmentResetGRU(self.hidden, name="fwd")(x, never)
        if lengths is None:
            last_fwd = fwd[:, -1]
        else:
            idx = jnp.maximum(lengths - 1, 0)
            last_fwd = jnp.take_along_axis(
                fwd, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        if not self.bidirectional:
            return fwd, last_fwd
        # backward over the valid region: mask tail to zero so the reversed
        # scan starts from the true end of each sequence
        if lengths is not None:
            valid = jnp.arange(T)[None, :] < lengths[:, None]
            x_b = jnp.where(valid[..., None], x, 0.0)
            reset_b = ~valid
        else:
            x_b, reset_b = x, never
        bwd = SegmentResetGRU(self.hidden, reverse=True, name="bwd")(
            x_b, reset_b)
        memory = jnp.concatenate([fwd, bwd], axis=-1)
        final = jnp.concatenate([last_fwd, bwd[:, 0]], axis=-1)
        return memory, final


# --------------------------------------------------------------------- #
# Du et al. 2021 — phone-level GMM-MDN prosody
# --------------------------------------------------------------------- #

class _ConvBlock2DMel(nn.Module):
    """(1, k) 2-D conv + BatchNorm + ReLU over (time, mel) —
    time-independent (reference ConvBlock2D, blocks.py:213-252, with
    kernel (1, k), bias-free conv, BatchNorm2d default normalization).

    Because the kernel never mixes across time, running it on the whole
    mel equals running it per phone-slice — EXCEPT BatchNorm train-mode
    statistics: the reference computes them per (B=1, slice) call
    (modules.py:186-201), i.e. per-phone batch stats, often over a
    single frame. Here train-mode stats pool the whole padded batch (the
    sane redesign); eval mode (running stats) is exactly the reference
    and is what tests/test_parity_prosody.py pins with ported weights.
    """
    out_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, x, training=False):
        # x: [B, T, n_mel, C_in]
        x = nn.Conv(self.out_channels, (1, self.kernel_size),
                    padding=[(0, 0), ((self.kernel_size - 1) // 2,
                                      self.kernel_size // 2)],
                    use_bias=False, param_dtype=jnp.float32,
                    kernel_init=nn.initializers.xavier_uniform())(x)
        x = nn.BatchNorm(use_running_average=not training,
                         param_dtype=jnp.float32)(x)
        return nn.relu(x)


class DuProsodyExtractor(nn.Module):
    """Target prosody embeddings e_k [B, T_s, 2·d_model]
    (model/modules.py:151-201)."""
    n_mel_channels: int
    d_model: int
    kernel_size: int

    @nn.compact
    def __call__(self, mel, mel_len, duration, src_mask, max_mel_len,
                 training=False):
        from ctts_tpu.ops.length_regulator import dur_to_mel2ph
        B, T_m, _ = mel.shape
        x = mel[..., None]                              # [B, T, mel, 1]
        x = _ConvBlock2DMel(self.d_model, self.kernel_size,
                            name="conv_0")(x, training)
        x = _ConvBlock2DMel(1, self.kernel_size,
                            name="conv_1")(x, training)[..., 0]  # [B,T,mel]

        mel2ph = dur_to_mel2ph(duration, src_mask, max_len=T_m)
        prev = jnp.concatenate([jnp.zeros_like(mel2ph[:, :1]),
                                mel2ph[:, :-1]], axis=1)
        boundary = mel2ph != prev                        # segment starts
        valid = mel2ph > 0

        fwd = SegmentResetGRU(self.d_model, name="gru_fwd")(x, boundary)
        # backward: reset at segment ENDS when scanning right-to-left
        nxt = jnp.concatenate([mel2ph[:, 1:],
                               jnp.zeros_like(mel2ph[:, :1])], axis=1)
        boundary_b = mel2ph != nxt
        bwd = SegmentResetGRU(self.d_model, reverse=True, name="gru_bwd")(
            x, boundary_b)

        # per-phone states: forward at last frame, backward at first frame
        cum = jnp.cumsum(jnp.round(duration).astype(jnp.int32)
                         * (1 - src_mask.astype(jnp.int32)), axis=1)
        last_idx = jnp.clip(cum - 1, 0, T_m - 1)                  # [B, T_s]
        first_idx = jnp.clip(cum - jnp.round(duration).astype(jnp.int32),
                             0, T_m - 1)
        h_fwd = jnp.take_along_axis(fwd, last_idx[..., None], axis=1)
        h_bwd = jnp.take_along_axis(bwd, first_idx[..., None], axis=1)
        e = jnp.concatenate([h_fwd, h_bwd], axis=-1)     # [B, T_s, 2H]
        return jnp.where(src_mask[..., None], 0.0, e)


class _MaskedConvBlock(nn.Module):
    """ConvNorm + LayerNorm + ReLU + dropout, masked (blocks.py:175-210)."""
    features: int
    kernel_size: int
    dropout: float

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        x = ConvNorm(self.features, self.kernel_size)(x)
        x = nn.LayerNorm(param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        # reference ConvBlock dropout is always active (blocks.py:203); we
        # use the standard deterministic switch instead (known ref defect)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return jnp.where(mask[..., None], 0.0, x)


class _ARGRUCell(nn.Module):
    """GRUCell fed [x_t, h_prev] (the reference's autoregressive predictor
    input, modules.py:285-293)."""
    hidden: int

    @nn.compact
    def __call__(self, h, x_t):
        inp = jnp.concatenate([x_t, h], axis=-1)
        return _GRUCellT(self.hidden, name="gru")(h, inp)


class MDN(nn.Module):
    """Mixture density head (model/modules.py:204-232)."""
    out_features: int
    num_gaussians: int

    @nn.compact
    def __call__(self, x):
        B, T, _ = x.shape
        w = nn.softmax(nn.Dense(self.num_gaussians, name="w")(x), axis=-1)
        sigma = jnp.exp(jnp.clip(
            nn.Dense(self.out_features * self.num_gaussians,
                     name="sigma")(x), -12.0, 12.0))
        mu = nn.Dense(self.out_features * self.num_gaussians, name="mu")(x)
        sigma = sigma.reshape(B, T, self.num_gaussians, self.out_features)
        mu = mu.reshape(B, T, self.num_gaussians, self.out_features)
        return w, sigma, mu


class DuProsodyPredictor(nn.Module):
    """Autoregressive GRU + GMM-MDN over phones (model/modules.py:235-329)."""
    d_model: int
    kernel_sizes: Tuple[int, ...] = (9, 5)
    num_gaussians: int = 20
    dropout: float = 0.2

    @nn.compact
    def __call__(self, h_text, src_mask, deterministic=True, training=True):
        x = h_text
        for i, k in enumerate(self.kernel_sizes):
            x = _MaskedConvBlock(self.d_model, k, self.dropout,
                                 name=f"conv_{i}")(x, src_mask, deterministic)

        B = x.shape[0]
        h0 = jnp.zeros((B, 2 * self.d_model), x.dtype)
        scan = nn.scan(_ARGRUCell, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        _, outputs = scan(2 * self.d_model, name="gru_cell")(h0, x)

        w, sigma, mu = MDN(2 * self.d_model, self.num_gaussians,
                           name="gmm_mdn")(outputs)
        fill_w = 0.0 if training else 1e-9
        w = jnp.where(src_mask[..., None], fill_w, w)
        sigma = jnp.where(src_mask[..., None, None], 0.0, sigma)
        mu = jnp.where(src_mask[..., None, None], 0.0, mu)
        return w, sigma, mu

    @staticmethod
    def sample(w, sigma, mu, rng, src_mask=None):
        """Categorical + gaussian draw (model/modules.py:304-329)."""
        B, T, G = w.shape
        k_rng, n_rng = jax.random.split(rng)
        comp = jax.random.categorical(
            k_rng, jnp.log(jnp.clip(w, 1e-9, None)))     # [B, T]
        take = lambda a: jnp.take_along_axis(            # noqa: E731
            a, comp[:, :, None, None], axis=2)[:, :, 0]
        sig, m = take(sigma), take(mu)
        noise = jax.random.normal(n_rng, m.shape, m.dtype)
        out = noise * sig + m
        if src_mask is not None:
            out = jnp.where(src_mask[..., None], 0.0, out)
        return out


# --------------------------------------------------------------------- #
# Liu et al. 2021 — DelightfulTTS utterance + phoneme prosody
# --------------------------------------------------------------------- #

class CoordConv2d(nn.Module):
    """Conv2d with coordinate channels appended (reference coordconv.py,
    rank 2 with_r=True; minus the hardcoded .cuda())."""
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C]. Channel order and values match the reference
        # AddCoords rank-2 with_r: first the H-coordinate ("xx" there),
        # then the W-coordinate ("yy"), both normalized to [-1, 1], and
        # rr = sqrt((h-0.5)^2 + (w-0.5)^2) AFTER that normalization
        # (coordconv.py:35-73 — the -0.5 offset is the reference's quirk,
        # kept so conv weights port 1:1).
        B, H, W, _ = x.shape
        hs = jnp.linspace(-1.0, 1.0, H)[None, :, None, None]
        ws = jnp.linspace(-1.0, 1.0, W)[None, None, :, None]
        hh = jnp.broadcast_to(hs, (B, H, W, 1))
        ww = jnp.broadcast_to(ws, (B, H, W, 1))
        rr = jnp.sqrt((hh - 0.5) ** 2 + (ww - 0.5) ** 2)
        x = jnp.concatenate([x, hh, ww, rr], axis=-1)
        return nn.Conv(self.features, self.kernel_size,
                       strides=self.strides,
                       padding=[(self.padding[0],) * 2,
                                (self.padding[1],) * 2],
                       param_dtype=jnp.float32)(x)


class ReferenceEncoder(nn.Module):
    """Strided conv stack + GRU over reference mel
    (model/modules.py:332-397). Returns (memory [B,T,H], final [B,H])."""
    preprocess_config: dict
    model_config: dict

    @nn.compact
    def __call__(self, mels, mel_mask, training=True):
        liu = self.model_config["prosody_modeling"]["liu2021"]
        filters = liu["ref_enc_filters"]
        size = tuple(liu["ref_enc_size"])
        strides = tuple(liu["ref_enc_strides"])
        pad = tuple(liu["ref_enc_pad"])
        gru_size = liu["ref_enc_gru_size"]

        out = mels[..., None]                            # [B, T, mel, 1]
        for i, f in enumerate(filters):
            if i == 0:
                out = CoordConv2d(f, size, strides, pad,
                                  name="conv_0")(out)
            else:
                out = nn.Conv(f, size, strides=strides,
                              padding=[(pad[0],) * 2, (pad[1],) * 2],
                              param_dtype=jnp.float32,
                              name=f"conv_{i}")(out)
            out = nn.BatchNorm(use_running_average=not training,
                               param_dtype=jnp.float32,
                               name=f"bn_{i}")(out)
            out = nn.relu(out)
        B, T, W, C = out.shape
        # flatten (C, W) — the reference's [N, C, T, W].transpose(1,2)
        # .view(N, T, C*W) order (modules.py:383-386), so GRU input
        # weights port 1:1
        out = out.transpose(0, 1, 3, 2).reshape(B, T, C * W)
        if mel_mask is not None:
            out = jnp.where(mel_mask[..., None], 0.0, out)
        lengths = None
        if mel_mask is not None:
            lengths = jnp.sum(~mel_mask, axis=1).astype(jnp.int32)
        memory, final = GRU(gru_size, name="gru")(out, lengths)
        return memory, final


class StyleEmbedAttention(nn.Module):
    """1-head style-token attention (model/modules.py:484-534)."""
    num_units: int
    key_dim: int

    @nn.compact
    def __call__(self, query, key_soft):
        init = nn.initializers.xavier_uniform()
        q = nn.Dense(self.num_units, use_bias=False, kernel_init=init,
                     name="W_query")(query)              # [B, 1, U]
        k = nn.Dense(self.num_units, use_bias=False, kernel_init=init,
                     name="W_key")(key_soft)             # [B, Tk, U]
        v = nn.Dense(self.num_units, use_bias=False, kernel_init=init,
                     name="W_value")(key_soft)
        scores = jnp.einsum("bqu,bku->bqk", q, k) / (self.key_dim ** 0.5)
        scores = nn.softmax(scores, axis=-1)
        return jnp.einsum("bqk,bku->bqu", scores, v)     # [B, 1, U]


class STL(nn.Module):
    """Style token layer (model/modules.py:453-481)."""
    model_config: dict

    @nn.compact
    def __call__(self, inputs):
        E = _enc_hidden(self.model_config)
        token_num = self.model_config["prosody_modeling"]["liu2021"]["token_num"]
        embed = self.param("embed", nn.initializers.normal(0.5),
                           (token_num, E))
        keys = jnp.tanh(embed)[None].repeat(inputs.shape[0], axis=0)
        return StyleEmbedAttention(E, E, name="attention")(
            inputs[:, None, :], keys)                    # [B, 1, E]


class UtteranceLevelProsodyEncoder(nn.Module):
    """(model/modules.py:537-569)"""
    preprocess_config: dict
    model_config: dict

    @nn.compact
    def __call__(self, mels, mel_mask, training=True, deterministic=True):
        liu = self.model_config["prosody_modeling"]["liu2021"]
        E = _enc_hidden(self.model_config)
        # ReferenceEncoder's `training` flag is its BN mode — follow
        # `deterministic` (postnet convention), not the branch flag
        _, final = ReferenceEncoder(self.preprocess_config,
                                    self.model_config,
                                    name="encoder")(mels, mel_mask,
                                                    not deterministic)
        x = nn.Dense(E // 2, name="encoder_prj")(final)
        x = STL(self.model_config, name="stl")(x)
        x = nn.Dense(liu["bottleneck_size_u"], name="encoder_bottleneck")(x)
        return nn.Dropout(liu["ref_attention_dropout"])(
            x, deterministic=deterministic)              # [B, 1, 256]


class PhonemeLevelProsodyEncoder(nn.Module):
    """(model/modules.py:400-450)"""
    preprocess_config: dict
    model_config: dict

    @nn.compact
    def __call__(self, x, src_mask, mels, mel_mask, training=True,
                 deterministic=True):
        liu = self.model_config["prosody_modeling"]["liu2021"]
        E = _enc_hidden(self.model_config)
        memory, _ = ReferenceEncoder(self.preprocess_config,
                                     self.model_config,
                                     name="encoder")(mels, mel_mask,
                                                     not deterministic)
        kv = nn.Dense(2 * E, name="encoder_prj")(memory)
        k, v = kv[..., :E], kv[..., E:]
        init = nn.initializers.xavier_uniform()
        q = nn.Dense(E, use_bias=False, kernel_init=init, name="q_lin")(x)
        k = nn.Dense(E, use_bias=False, kernel_init=init, name="k_lin")(k)
        attn = jnp.einsum("bsc,bmc->bsm", q, k) / math.sqrt(E)
        attn = jnp.where(mel_mask[:, None, :], -jnp.inf, attn)
        attn = nn.softmax(attn, axis=-1)
        attn = nn.Dropout(liu["ref_attention_dropout"])(
            attn, deterministic=deterministic)
        attn = jnp.where(src_mask[:, :, None], 0.0, attn)
        out = nn.Dense(liu["bottleneck_size_p"],
                       name="encoder_bottleneck")(
            jnp.einsum("bsm,bmc->bsc", attn, v))
        out = jnp.where(src_mask[..., None], 0.0, out)
        return out, attn


class ParallelProsodyPredictor(nn.Module):
    """Conv stack → BiGRU → bottleneck (model/modules.py:572-648)."""
    model_config: dict
    phoneme_level: bool = True

    @nn.compact
    def __call__(self, x, deterministic=True):
        liu = self.model_config["prosody_modeling"]["liu2021"]
        E = _enc_hidden(self.model_config)
        k = liu["predictor_kernel_size"]
        drop = liu["predictor_dropout"]
        bottleneck = (liu["bottleneck_size_p"] if self.phoneme_level
                      else liu["bottleneck_size_u"])
        for i in range(2):
            x = ConvNorm(E, k, name=f"conv1d_{i+1}")(x)
            x = nn.relu(x)
            x = nn.LayerNorm(param_dtype=jnp.float32)(x)
            x = nn.Dropout(drop)(x, deterministic=deterministic)
        memory, final = GRU(E // 2, bidirectional=True, name="gru")(x)
        if self.phoneme_level:
            vec = memory                                 # [B, T, E]
        else:
            vec = final[:, None, :]                      # [B, 1, E]
        return nn.Dense(bottleneck, name="predictor_bottleneck")(vec)


class NonParallelProsodyPredictor(nn.Module):
    """Autoregressive (GRU) prosody predictor — the reference's alternative
    liu2021 predictor (model/modules.py:651-723; instantiated variant is the
    parallel one, modules.py:854-857). Provided for parity."""
    model_config: dict
    phoneme_level: bool = True

    @nn.compact
    def __call__(self, x, src_mask=None, deterministic=True):
        liu = self.model_config["prosody_modeling"]["liu2021"]
        E = _enc_hidden(self.model_config)
        ks = liu["predictor_kernel_size"]
        kernel_sizes = ks if isinstance(ks, (list, tuple)) else (ks, ks)
        drop = liu["predictor_dropout"]
        bottleneck = (liu["bottleneck_size_p"] if self.phoneme_level
                      else liu["bottleneck_size_u"])
        for i, k in enumerate(kernel_sizes[:2]):
            x = _MaskedConvBlock(E, k, drop, name=f"conv_{i}")(
                x, src_mask if src_mask is not None
                else jnp.zeros(x.shape[:2], bool), deterministic)
        B = x.shape[0]
        h0 = jnp.zeros((B, 2 * E), x.dtype)
        scan = nn.scan(_ARGRUCell, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        _, outputs = scan(2 * E, name="gru_cell")(h0, x)
        if src_mask is not None:
            outputs = jnp.where(src_mask[..., None], 0.0, outputs)
        vec = outputs if self.phoneme_level else \
            jnp.mean(outputs, axis=1, keepdims=True)
        return nn.Dense(bottleneck, name="predictor_bottleneck")(vec)


class LiuProsody(nn.Module):
    """Wiring of encoders (train targets) + predictors (vectors)
    (model/modules.py:845-861, 1002-1023)."""
    preprocess_config: dict
    model_config: dict

    @nn.compact
    def __call__(self, x, src_mask, mel, mel_mask, training=True,
                 deterministic=True):
        E = _enc_hidden(self.model_config)
        liu = self.model_config["prosody_modeling"]["liu2021"]
        up_enc = UtteranceLevelProsodyEncoder(
            self.preprocess_config, self.model_config,
            name="utterance_prosody_encoder")
        pp_enc = PhonemeLevelProsodyEncoder(
            self.preprocess_config, self.model_config,
            name="phoneme_prosody_encoder")
        up_pred = ParallelProsodyPredictor(
            self.model_config, phoneme_level=False,
            name="utterance_prosody_predictor")
        pp_pred = ParallelProsodyPredictor(
            self.model_config, phoneme_level=True,
            name="phoneme_prosody_predictor")
        up_prj = nn.Dense(E, name="utterance_prosody_prj")
        pp_prj = nn.Dense(E, name="phoneme_prosody_prj")

        up_tgt = pp_tgt = pp_attn = None
        if training:
            up_tgt = up_enc(mel, mel_mask, training, deterministic)
            pp_tgt, pp_attn = pp_enc(x, src_mask, mel, mel_mask, training,
                                     deterministic)
        up_vec = up_pred(x, deterministic)
        x = x + up_prj(up_tgt if training else up_vec)
        pp_vec = pp_pred(x, deterministic)
        x = x + pp_prj(pp_tgt if training else pp_vec)
        return x, (up_tgt, pp_tgt, up_vec, pp_vec, pp_attn)


def _enc_hidden(model_config):
    bt = model_config["block_type"]
    key = bt if bt in model_config else "transformer"
    return model_config[key]["encoder_hidden"]

"""Unsupervised alignment encoder ("One TTS Alignment To Rule Them All").

Re-design of the reference AlignmentEncoder (model/modules.py:1117-1213).
The Gaussian isotropic attention -T·‖q−k‖² is expanded to
-T·(|q|² + |k|² − 2 q·k) so the cross term rides the MXU as one matmul
instead of materializing a [B, C, T_m, T_s] broadcast.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctts_tpu.models.blocks import ConvNorm


class AlignmentEncoder(nn.Module):
    n_mel_channels: int
    n_att_channels: int
    n_text_channels: int
    temperature: float
    multi_speaker: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mels, text_emb, src_padding_mask, attn_prior=None,
                 speaker_embed=None):
        """
        mels: [B, T_m, n_mel]; text_emb: [B, T_s, C_text]
        src_padding_mask: [B, T_s] True at padding.
        attn_prior: [B, T_m, T_s] beta-binomial prior or None.
        Returns (attn_soft [B, T_m, T_s], attn_logprob [B, T_m, T_s]).
        """
        if self.multi_speaker and speaker_embed is not None:
            text_emb = text_emb + nn.Dense(
                self.n_text_channels, param_dtype=jnp.float32,
                kernel_init=nn.initializers.xavier_uniform(),
                use_bias=False, name="key_spk_proj")(speaker_embed)[:, None]
            mels = mels + nn.Dense(
                self.n_mel_channels, param_dtype=jnp.float32,
                kernel_init=nn.initializers.xavier_uniform(),
                use_bias=False, name="query_spk_proj")(speaker_embed)[:, None]

        keys = ConvNorm(self.n_text_channels * 2, 3, dtype=self.dtype,
                        name="key_proj_0")(text_emb)
        keys = nn.relu(keys)
        keys = ConvNorm(self.n_att_channels, 1, dtype=self.dtype,
                        name="key_proj_1")(keys)          # [B, T_s, C_att]

        q = ConvNorm(self.n_mel_channels * 2, 3, dtype=self.dtype,
                     name="query_proj_0")(mels)
        q = nn.relu(q)
        q = ConvNorm(self.n_mel_channels, 1, dtype=self.dtype,
                     name="query_proj_1")(q)
        q = nn.relu(q)
        q = ConvNorm(self.n_att_channels, 1, dtype=self.dtype,
                     name="query_proj_2")(q)              # [B, T_m, C_att]

        q = q.astype(jnp.float32)
        keys = keys.astype(jnp.float32)
        q_sq = jnp.sum(q * q, axis=-1)                    # [B, T_m]
        k_sq = jnp.sum(keys * keys, axis=-1)              # [B, T_s]
        cross = jnp.einsum("bmc,bsc->bms", q, keys)       # MXU
        dist = q_sq[:, :, None] + k_sq[:, None, :] - 2.0 * cross
        attn = -self.temperature * dist                   # [B, T_m, T_s]

        if attn_prior is not None:
            attn = (jax.nn.log_softmax(attn, axis=-1)
                    + jnp.log(attn_prior + 1e-8))

        attn_logprob = attn
        attn = jnp.where(src_padding_mask[:, None, :],
                         -jnp.inf, attn)
        attn_soft = jax.nn.softmax(attn, axis=-1)
        return attn_soft, attn_logprob

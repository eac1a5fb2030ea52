"""Duration → frame upsampling as fixed-shape gathers.

The reference expands token vectors with a per-utterance Python loop
(model/modules.py:1216-1249) plus a cumsum "token mask" trick for mel2ph
(utils/tools.py:598-628). On TPU both become one formulation: compute
``mel2ph`` (1-based token index per output frame, 0 = padding) with a
searchsorted over the duration cumsum, then upsample any per-token tensor
with a single ``take_along_axis`` gather. Everything is static-shape: the
caller supplies ``max_len`` (the padded mel length).
"""

import jax
import jax.numpy as jnp


def dur_to_mel2ph(dur, dur_padding=None, alpha=1.0, max_len=None):
    """Durations → mel2ph map.

    Args:
      dur: [B, T_txt] durations (float or int; rounded like the reference).
      dur_padding: optional [B, T_txt] bool/0-1, True at padded tokens.
      alpha: duration rescale coefficient.
      max_len: output frame count (static). Defaults to T_txt is not allowed —
        pass it explicitly under jit.

    Returns:
      mel2ph: [B, max_len] int32; frame t holds 1-based index of its source
      token, 0 for frames beyond the utterance's total duration.
    """
    dur = jnp.round(dur.astype(jnp.float32) * alpha).astype(jnp.int32)
    if dur_padding is not None:
        dur = dur * (1 - dur_padding.astype(jnp.int32))
    assert max_len is not None, "max_len must be static under jit"
    cum = jnp.cumsum(dur, axis=1)                      # [B, T_txt]
    pos = jnp.arange(max_len)[None, :]                 # [1, T_mel]
    # token index for frame t = #{tokens whose cumsum <= t} + 1
    mel2ph = jax.vmap(
        lambda c, p: jnp.searchsorted(c, p, side="right")
    )(cum, jnp.broadcast_to(pos, (dur.shape[0], max_len))) + 1
    total = cum[:, -1:]
    return jnp.where(pos < total, mel2ph, 0).astype(jnp.int32)


def gather_by_mel2ph(x, mel2ph):
    """Upsample per-token values to frames.

    x: [B, T_txt, C] (or [B, T_txt]); mel2ph: [B, T_mel] (0 = pad → zeros).
    Returns [B, T_mel, C] (or [B, T_mel]). Routed through the one-hot
    MXU gather when shapes allow (XLA's take_along_axis is a serial
    per-index loop on TPU — see ops/sort_gather.py); bit-identical.
    """
    from ctts_tpu.ops import sort_gather
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    B, T, C = x.shape
    extra = (-(T + 1)) % 8 + 1        # row 0 = the mel2ph==0 zero row
    x_pad = jnp.concatenate([jnp.zeros((B, extra, C), x.dtype), x], axis=1)
    shifted = mel2ph + (extra - 1)    # index 0 still hits a zero row
    if sort_gather.supported(T + extra, mel2ph.shape[1], C, dtype=x.dtype):
        out = sort_gather.gather_rows(x_pad, shifted)
    else:
        out = jnp.take_along_axis(x_pad, shifted[..., None], axis=1)
    return out[..., 0] if squeeze else out


def length_regulate(x, dur, max_len, dur_padding=None, alpha=1.0):
    """LengthRegulator: expand [B, T_txt, C] by durations to [B, max_len, C].

    Returns (frames, mel_len, mel2ph). Equivalent to the reference
    LengthRegulator (model/modules.py:1216-1249) but fixed-shape.
    """
    mel2ph = dur_to_mel2ph(dur, dur_padding=dur_padding, alpha=alpha,
                           max_len=max_len)
    out = gather_by_mel2ph(x, mel2ph)
    dur_i = jnp.round(dur.astype(jnp.float32) * alpha).astype(jnp.int32)
    if dur_padding is not None:
        dur_i = dur_i * (1 - dur_padding.astype(jnp.int32))
    mel_len = jnp.minimum(jnp.sum(dur_i, axis=1), max_len).astype(jnp.int32)
    return out, mel_len, mel2ph


def mel2ph_to_dur(mel2ph, t_txt, max_dur=None):
    """Invert mel2ph back to durations [B, t_txt] (utils/tools.py:631-637)."""
    one = jnp.ones_like(mel2ph)
    dur = jax.vmap(
        lambda m, o: jnp.zeros(t_txt + 1, jnp.int32).at[m].add(o)
    )(mel2ph, one)[:, 1:]
    if max_dur is not None:
        dur = jnp.minimum(dur, max_dur)
    return dur

"""Segment (per-phoneme) reductions over frame-level features.

Replaces the reference's CPU/numpy phoneme-averaging loops
(utils/tools.py:47-66, called via device round-trips at
model/modules.py:874-888) with on-device segment sums.
"""

import jax
import jax.numpy as jnp


def phoneme_mean_by_mel2ph(frame_values, mel2ph, t_txt):
    """Average frame values per phoneme.

    frame_values: [B, T_mel]; mel2ph: [B, T_mel] 1-based (0 = pad).
    Returns [B, t_txt]; phonemes with no frames get 0 (sum/“max(count,1)”
    semantics, matching utils/tools.py:47-53).
    """
    def one(vals, m2p):
        sums = jnp.zeros(t_txt + 1, vals.dtype).at[m2p].add(vals)
        cnts = jnp.zeros(t_txt + 1, vals.dtype).at[m2p].add(
            jnp.ones_like(vals))
        return sums[1:] / jnp.maximum(cnts[1:], 1.0)
    return jax.vmap(one)(frame_values, mel2ph)


def phoneme_mean_by_duration(frame_values, duration, t_txt, max_len):
    """Average frame values per phoneme given durations (reference
    utils/tools.py:56-66). duration: [B, t_txt] int."""
    from ctts_tpu.ops.length_regulator import dur_to_mel2ph
    mel2ph = dur_to_mel2ph(duration, max_len=max_len)
    return phoneme_mean_by_mel2ph(frame_values, mel2ph, t_txt)

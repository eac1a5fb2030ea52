"""Length/padding mask helpers (static-shape, jit-friendly).

Mask convention matches the reference (utils/tools.py:188-196): ``True`` AT
PADDING positions. All helpers take an explicit ``max_len`` so shapes stay
static under jit.
"""

import jax.numpy as jnp


def get_mask_from_lengths(lengths, max_len):
    """[B] lengths → [B, max_len] bool mask, True where index >= length."""
    ids = jnp.arange(max_len)[None, :]
    return ids >= lengths[:, None]


def lengths_from_mask(mask):
    """[B, T] padding mask → [B] lengths."""
    return jnp.sum(~mask, axis=-1).astype(jnp.int32)


def apply_mask(x, mask, fill=0.0):
    """Zero (or fill) x at padding positions; mask is [B, T], x is [B, T, ...]."""
    extra = x.ndim - mask.ndim
    m = mask.reshape(mask.shape + (1,) * extra)
    return jnp.where(m, jnp.asarray(fill, x.dtype), x)

"""SSIM on mel-like feature maps (jnp, differentiable).

The reference carries an ssim helper (utils/tools.py:655-698) used by the
cwt_loss "ssim" option (model/loss.py:106-115, 228-229), but it is broken
there (missing imports). This is a working implementation with the standard
11×11 Gaussian window, σ=1.5, C1/C2 for unit dynamic range.
"""

import jax
import jax.numpy as jnp


def _gaussian_window(size=11, sigma=1.5):
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return g[:, None] * g[None, :]                      # [size, size]


def ssim_map(img1, img2, window_size=11):
    """img: [B, H, W] → per-pixel SSIM [B, H, W] (SAME padding)."""
    w = _gaussian_window(window_size)[:, :, None, None]  # HWIO

    def filt(x):
        return jax.lax.conv_general_dilated(
            x[:, :, :, None], w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[:, :, :, 0]

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(img1 * img1) - mu1_sq
    s2 = filt(img2 * img2) - mu2_sq
    s12 = filt(img1 * img2) - mu12
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    return ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))


def ssim(img1, img2, window_size=11, size_average=True):
    m = ssim_map(img1, img2, window_size)
    if size_average:
        return jnp.mean(m)
    return jnp.mean(m, axis=(1, 2))


def ssim_loss(pred, target, bias=6.0, window_size=11):
    """1 − SSIM with the reference's bias shift (model/loss.py:106-115),
    weighted by nonzero-target rows."""
    weights = (jnp.sum(jnp.abs(target), axis=-1, keepdims=True) != 0
               ).astype(jnp.float32)
    per = 1.0 - ssim(pred + bias, target + bias, window_size,
                     size_average=False)                # [B]
    w = jnp.mean(weights, axis=(1, 2))
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-8)

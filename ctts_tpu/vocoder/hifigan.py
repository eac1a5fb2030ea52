"""HiFi-GAN V1 generator in JAX/flax ([B, T, C] layout).

Architecture parity with the reference generator (hifigan/models.py:20-112,
hifigan/config.json): conv_pre(k7) → 4×[transposed-conv upsample
(k 16/16/4/4, stride 8/8/2/2) + MRF of 3 ResBlocks (k 3/7/11, d 1/3/5)] →
leaky_relu → conv_post(k7) → tanh. Weight-norm is already folded at load
time (utils/model.py:57-69 removes it), so plain convs match exactly.

``load_torch_generator`` ports a reference `generator_*.pth.tar` state dict
into this module's parameter tree for bit-level output parity.
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LRELU_SLOPE = 0.1

V1_CONFIG = {
    "upsample_rates": (8, 8, 2, 2),
    "upsample_kernel_sizes": (16, 16, 4, 4),
    "upsample_initial_channel": 512,
    "resblock_kernel_sizes": (3, 7, 11),
    "resblock_dilation_sizes": ((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    "num_mels": 80,
}


class _Conv(nn.Module):
    features: int
    kernel_size: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, d = self.kernel_size, self.dilation
        pad = d * (k - 1) // 2
        return nn.Conv(self.features, (k,), kernel_dilation=(d,),
                       padding=[(pad, d * (k - 1) - pad)],
                       dtype=self.dtype, param_dtype=jnp.float32)(x)


class _ConvTranspose(nn.Module):
    """Matches torch ConvTranspose1d(k, stride=u, padding=(k-u)//2).

    On TPU the strided transposed conv lowers to a scatter-shaped op that
    wastes MXU cycles; for HiFi-GAN V1 every upsample has k = 2u, so the
    SAME math reassociates into a dense kernel-2 conv producing u·C_out
    channels followed by a depth-to-space reshape and a u/2 phase shift
    (subpixel convolution). Derivation: with torch's crop pad = (k-u)//2 =
    u/2,  y[n] = Σ_in x[q', in]·W[s, o, in] + x[q'-1, in]·W[s+u, o, in]
    where q' = (n + u/2) // u and s = (n + u/2) mod u — exactly two input
    taps per output, independent of n. The kernel-2 conv is one
    [2·C_in → u·C_out] matmul per input frame: pure MXU work.

    MEASURED on real TPU (tools/bench_vocoder.py, full V1 generator,
    bf16): subpixel is 0.95x at B=128/T=896, 0.87x at B=32/T=896, and
    only 1.04x at the B=1 streaming chunk — XLA's conv_transpose
    lowering wins at serving shapes, so the default is the transposed
    conv and `CTTS_SUBPIX=1` opts in to the subpixel path (bit-parity
    tested in tests/test_hifigan.py either way).
    """
    features: int
    kernel_size: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os
        k, u, co = self.kernel_size, self.stride, self.features
        ci = x.shape[-1]
        # same layout nn.ConvTranspose(transpose_kernel=True) used: [k, out, in]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, co, ci))
        bias = self.param("bias", nn.initializers.zeros, (co,))
        pad = (k - u) // 2
        subpix = (k == 2 * u and u % 2 == 0
                  and os.environ.get("CTTS_SUBPIX", "0") == "1")
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        if not subpix:
            y = jax.lax.conv_transpose(
                xd, kd, strides=(u,), padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
                transpose_kernel=True)
            y = y[:, pad: y.shape[1] - (k - u - pad), :]
            return y + bias.astype(self.dtype)
        B, T = x.shape[0], x.shape[1]
        # tap 0 multiplies x[q'-1] with W[s+u], tap 1 multiplies x[q'] with
        # W[s]:  [2, C_in, u*C_out], phase-major output channels
        k_new = jnp.stack([
            kd[u:2 * u].transpose(2, 0, 1).reshape(ci, u * co),
            kd[0:u].transpose(2, 0, 1).reshape(ci, u * co)], axis=0)
        c = jax.lax.conv_general_dilated(
            xd, k_new, window_strides=(1,), padding=[(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"))          # [B, T+1, u*co]
        y = c.reshape(B, (T + 1) * u, co)[:, u // 2: u // 2 + T * u, :]
        return y + bias.astype(self.dtype)


class ResBlock1(nn.Module):
    """MRF residual block (hifigan/models.py ResBlock1).

    Parameters are stacked over dilations ([n_dil, k, C, C] kernels) so the
    whole 6-conv chain can run as ONE Pallas kernel on TPU
    (ops/fused_resblock.py) — one HBM read/write instead of twelve. Falls
    back to XLA convs off-TPU or for wide channels.
    """
    channels: int
    kernel_size: int
    dilations: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ctts_tpu.ops.fused_resblock import (fused_resblock1,
                                                 reference_resblock1,
                                                 _INTERPRET)
        C, k, nd = self.channels, self.kernel_size, len(self.dilations)
        init = nn.initializers.normal(0.01)
        w1 = self.param("w1", init, (nd, k, C, C))
        b1 = self.param("b1", nn.initializers.zeros, (nd, C))
        w2 = self.param("w2", init, (nd, k, C, C))
        b2 = self.param("b2", nn.initializers.zeros, (nd, C))
        import os
        # Measured on v5e: XLA's dilated convs already run near the HBM
        # roofline (e.g. 4.7 ms vs 8.9 ms fused at C=128/T=16k/B=16), so the
        # fused kernel is opt-in for experimentation, not the default.
        want_fuse = os.environ.get("CTTS_FUSE_RESBLOCK", "") == "1"
        use_pallas = (want_fuse
                      and (jax.default_backend() not in ("cpu",) or _INTERPRET)
                      and C <= 128 and x.shape[1] % 128 == 0)
        fn = fused_resblock1 if use_pallas else reference_resblock1
        return fn(x, w1, b1, w2, b2, k,
                  tuple(self.dilations)).astype(x.dtype)


class HiFiGANGenerator(nn.Module):
    config: dict = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel):
        """mel: [B, T, n_mel] (log-mel) → wav [B, T·256]."""
        cfg = self.config or V1_CONFIG
        ch = cfg["upsample_initial_channel"]
        x = _Conv(ch, 7, dtype=self.dtype, name="conv_pre")(
            mel.astype(self.dtype))
        rk = cfg["resblock_kernel_sizes"]
        rd = cfg["resblock_dilation_sizes"]
        for i, (u, k) in enumerate(zip(cfg["upsample_rates"],
                                       cfg["upsample_kernel_sizes"])):
            x = nn.leaky_relu(x, LRELU_SLOPE)
            ch = ch // 2
            x = _ConvTranspose(ch, k, u, dtype=self.dtype,
                               name=f"ups_{i}")(x)
            acc = None
            for j, (rks, rds) in enumerate(zip(rk, rd)):
                y = ResBlock1(ch, rks, rds, dtype=self.dtype,
                              name=f"resblocks_{i * len(rk) + j}")(x)
                acc = y if acc is None else acc + y
            x = acc / len(rk)
        # final activation uses torch's default slope 0.01
        # (hifigan/models.py:161)
        x = nn.leaky_relu(x, 0.01)
        x = _Conv(1, 7, dtype=self.dtype, name="conv_post")(x)
        return jnp.tanh(x.astype(jnp.float32))[..., 0]


def load_torch_generator(path):
    """Port a reference HiFi-GAN checkpoint (dict with key "generator",
    weight-norm folded) into flax params. Returns (params, config)."""
    import torch
    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt["generator"] if "generator" in ckpt else ckpt
    sd = {k: v.numpy() for k, v in sd.items()}

    def fold_wn(prefix):
        """weight_g/weight_v → weight if weight-norm wasn't removed."""
        if prefix + ".weight" in sd:
            return sd[prefix + ".weight"]
        g = sd[prefix + ".weight_g"]
        v = sd[prefix + ".weight_v"]
        norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
        return g * v / norm

    def conv_w(prefix):
        # torch [out, in, k] → flax [k, in, out]
        return np.transpose(fold_wn(prefix), (2, 1, 0))

    def convT_w(prefix):
        # torch convT [in, out, k] → flax transpose_kernel=True wants
        # [k, out, in]  (flipped spatially is handled by transpose conv
        # definition parity: torch convT cross-correlates with the kernel
        # as-is, which equals flax transpose_kernel=True)
        return np.transpose(fold_wn(prefix), (2, 1, 0))

    params = {}
    params["conv_pre"] = {"Conv_0": {
        "kernel": conv_w("conv_pre"), "bias": sd["conv_pre.bias"]}}
    n_ups = len(V1_CONFIG["upsample_rates"])
    for i in range(n_ups):
        params[f"ups_{i}"] = {
            "kernel": convT_w(f"ups.{i}"), "bias": sd[f"ups.{i}.bias"]}
    n_res = len(V1_CONFIG["resblock_kernel_sizes"])
    for r in range(n_ups * n_res):
        params[f"resblocks_{r}"] = {
            "w1": np.stack([conv_w(f"resblocks.{r}.convs1.{j}")
                            for j in range(3)]),
            "b1": np.stack([sd[f"resblocks.{r}.convs1.{j}.bias"]
                            for j in range(3)]),
            "w2": np.stack([conv_w(f"resblocks.{r}.convs2.{j}")
                            for j in range(3)]),
            "b2": np.stack([sd[f"resblocks.{r}.convs2.{j}.bias"]
                            for j in range(3)]),
        }
    params["conv_post"] = {"Conv_0": {
        "kernel": conv_w("conv_post"), "bias": sd["conv_post.bias"]}}
    return {"params": params}, dict(V1_CONFIG)

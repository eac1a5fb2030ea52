"""MelGAN generator in JAX (descriptinc/melgan-neurips architecture).

The reference loads MelGAN via torch.hub (utils/model.py:46-56); this is the
same generator re-implemented for TPU: conv7 → 4×[leaky_relu → transposed
conv (k=2r, stride r) → 3 residual dilated blocks (d = 1, 3, 9)] →
leaky_relu → conv7 → tanh, ratios (8, 8, 2, 2) for 256× upsampling.
MelGAN consumes log10 mels — the caller divides natural-log mels by ln(10)
(utils/model.py:77-78). `load_torch_melgan` ports a downloaded torch
checkpoint (weight-norm folded).
"""

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LRELU = 0.2


class _RefConv(nn.Module):
    """Conv with reflection padding (melgan uses ReflectionPad1d)."""
    features: int
    kernel_size: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, d = self.kernel_size, self.dilation
        pad = d * (k - 1) // 2
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        return nn.Conv(self.features, (k,), kernel_dilation=(d,),
                       padding="VALID", dtype=self.dtype,
                       param_dtype=jnp.float32)(x)


class _ResnetBlock(nn.Module):
    dim: int
    dilation: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.leaky_relu(x, LRELU)
        h = _RefConv(self.dim, 3, self.dilation, self.dtype,
                     name="block_conv")(h)
        h = nn.leaky_relu(h, LRELU)
        h = nn.Conv(self.dim, (1,), dtype=self.dtype,
                    param_dtype=jnp.float32, name="block_out")(h)
        s = nn.Conv(self.dim, (1,), dtype=self.dtype,
                    param_dtype=jnp.float32, name="shortcut")(x)
        return h + s


class _UpsampleConvT(nn.Module):
    """torch ConvTranspose1d(k=2r, stride=r, padding=r//2 + r%2,
    output_padding=r%2) parity."""
    features: int
    ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os
        import jax
        r, co, ci = self.ratio, self.features, x.shape[-1]
        k = 2 * r
        pad = r // 2 + r % 2
        out_pad = r % 2
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, co, ci))
        bias = self.param("bias", nn.initializers.zeros, (co,))
        xd, kd = x.astype(self.dtype), kernel.astype(self.dtype)
        # every descript-melgan ratio is even → pad = r/2, out_pad = 0: the
        # identical subpixel reassociation as hifigan._ConvTranspose (one
        # kernel-2 dense conv to r·C_out channels + depth-to-space + r/2
        # phase shift) — exact same math, MXU-shaped
        if r % 2 == 0 and os.environ.get("CTTS_SUBPIX", "0") == "1":
            B, T = x.shape[0], x.shape[1]
            k_new = jnp.stack([
                kd[r:2 * r].transpose(2, 0, 1).reshape(ci, r * co),
                kd[0:r].transpose(2, 0, 1).reshape(ci, r * co)], axis=0)
            c = jax.lax.conv_general_dilated(
                xd, k_new, window_strides=(1,), padding=[(1, 1)],
                dimension_numbers=("NWC", "WIO", "NWC"))
            y = c.reshape(B, (T + 1) * r, co)[:, r // 2: r // 2 + T * r, :]
            return y + bias.astype(self.dtype)
        y = jax.lax.conv_transpose(
            xd, kd, strides=(r,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"), transpose_kernel=True)
        # torch length: (T-1)r - 2·pad + k + out_pad; VALID gives (T-1)r + k
        end = y.shape[1] - (2 * pad - out_pad) + pad
        return y[:, pad:end, :] + bias.astype(self.dtype)


class MelGANGenerator(nn.Module):
    ratios: Sequence[int] = (8, 8, 2, 2)
    ngf: int = 32
    n_residual_layers: int = 3
    n_mel: int = 80
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel):
        """mel: [B, T, n_mel] (log10-scaled) → wav [B, T·256]."""
        mult = int(2 ** len(self.ratios))
        x = _RefConv(mult * self.ngf, 7, dtype=self.dtype,
                     name="conv_in")(mel.astype(self.dtype))
        for i, r in enumerate(self.ratios):
            mult //= 2
            x = nn.leaky_relu(x, LRELU)
            x = _UpsampleConvT(mult * self.ngf, r, self.dtype,
                               name=f"up_{i}")(x)
            for j in range(self.n_residual_layers):
                x = _ResnetBlock(mult * self.ngf, 3 ** j, self.dtype,
                                 name=f"res_{i}_{j}")(x)
        x = nn.leaky_relu(x, LRELU)
        x = _RefConv(1, 7, dtype=self.dtype, name="conv_out")(x)
        return jnp.tanh(x.astype(jnp.float32))[..., 0]


def load_torch_melgan(path, ratios=(8, 8, 2, 2), n_residual_layers=3):
    """Port a descript melgan-neurips generator checkpoint.

    The torch generator is one nn.Sequential
    [pad, conv_in, (lrelu, convT, res×N) per ratio, lrelu, pad, conv_out,
    tanh]; ResnetBlock holds .block.{2,4} convs and .shortcut. The
    Sequential indices are NOT hardcoded — they are recovered from the
    state_dict itself (resblocks are the indices with `.block.` children;
    the remaining weight-bearing indices are conv_in, the upsamplers, and
    conv_out in order), so torch.hub revisions that shift padding/activation
    slots still import. Structural mismatches raise with the discovered
    layout instead of an opaque KeyError.
    """
    import re as _re
    import torch
    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and not any(hasattr(v, "numpy")
                                        for v in sd.values()):
        sd = sd.get("model", sd.get("state_dict", sd))
    sd = {k.replace("model.", "", 1) if k.startswith("model.") else k:
          np.asarray(v) for k, v in sd.items()}

    def _err(msg):
        sample = "\n  ".join(sorted(sd)[:14])
        raise ValueError(
            f"melgan import: {msg}\nThis importer expects the "
            "descript/melgan-neurips generator layout (torch.hub "
            "'descript/melgan-neurips', load_melgan). First checkpoint "
            f"keys:\n  {sample}\n({len(sd)} keys total)")

    def _get(key):
        if key not in sd:
            _err(f"missing key {key!r}")
        return sd[key]

    def fold(prefix):
        if f"{prefix}.weight" in sd:
            return sd[f"{prefix}.weight"]
        g, v = _get(f"{prefix}.weight_g"), _get(f"{prefix}.weight_v")
        return g * v / np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))

    def conv(prefix):                # torch [out,in,k] → flax [k,in,out]
        return {"kernel": np.transpose(fold(prefix), (2, 1, 0)),
                "bias": _get(f"{prefix}.bias")}

    convT = conv                     # torch [in,out,k] → flax [k,out,in]

    # recover the Sequential layout from the keys
    weighted = sorted({int(m.group(1)) for k in sd
                       if (m := _re.match(r"^(\d+)\.(weight|weight_g)$", k))})
    res_idx = sorted({int(m.group(1)) for k in sd
                      if (m := _re.match(r"^(\d+)\.block\.", k))})
    if len(weighted) < 3:
        _err(f"found only {len(weighted)} plain conv indices {weighted}")
    conv_in_i, conv_out_i = weighted[0], weighted[-1]
    up_is = weighted[1:-1]
    if len(up_is) != len(ratios):
        _err(f"found {len(up_is)} upsample convs at indices {up_is} but "
             f"{len(ratios)} ratios {tuple(ratios)} were requested")
    groups = [[r for r in res_idx if up < r < nxt]
              for up, nxt in zip(up_is, up_is[1:] + [conv_out_i])]
    if any(len(g) != n_residual_layers for g in groups):
        _err(f"residual blocks per stage {[len(g) for g in groups]} != "
             f"n_residual_layers={n_residual_layers}")

    params = {"conv_in": {"Conv_0": conv(str(conv_in_i))}}
    for u, (up, group) in enumerate(zip(up_is, groups)):
        params[f"up_{u}"] = convT(str(up))
        for j, ri in enumerate(group):
            params[f"res_{u}_{j}"] = {
                "block_conv": {"Conv_0": conv(f"{ri}.block.2")},
                "block_out": conv(f"{ri}.block.4"),
                "shortcut": conv(f"{ri}.shortcut"),
            }
    params["conv_out"] = {"Conv_0": conv(str(conv_out_i))}
    return {"params": params}



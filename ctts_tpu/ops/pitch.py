"""F0 quantization / normalization math (jnp, jit-friendly).

Mirrors the semantics of the reference pitch tools
(utils/pitch_tools.py:20-82): 256-bin mel-scale coarse quantization and
standard/log normalization with optional unvoiced masking. The offline
(numpy) interpolation helpers used only by the preprocessor live in
:mod:`ctts_tpu.preprocessing.pitch`.
"""

import math

import jax.numpy as jnp

F0_BIN = 256
F0_MAX = 1100.0
F0_MIN = 50.0
# Plain-python constants: importing this module must never initialize a jax
# backend (the driver's dryrun_multichip needs to pick the platform first).
_F0_MEL_MIN = 1127.0 * math.log(1.0 + F0_MIN / 700.0)
_F0_MEL_MAX = 1127.0 * math.log(1.0 + F0_MAX / 700.0)


def f0_to_coarse(f0):
    """Hz → integer bins 1..255 (0 Hz stays in bin 1; pad handled upstream)."""
    f0_mel = 1127.0 * jnp.log(1.0 + f0 / 700.0)
    scaled = (f0_mel - _F0_MEL_MIN) * (F0_BIN - 2) / (_F0_MEL_MAX - _F0_MEL_MIN) + 1.0
    f0_mel = jnp.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = jnp.clip(f0_mel, 1.0, F0_BIN - 1)
    return jnp.floor(f0_mel + 0.5).astype(jnp.int32)


def norm_f0(f0, uv, pitch_config):
    """Normalize f0 (standard or log2); zero unvoiced frames if use_uv."""
    if pitch_config["pitch_norm"] == "standard":
        f0 = (f0 - pitch_config["f0_mean"]) / pitch_config["f0_std"]
    elif pitch_config["pitch_norm"] == "log":
        f0 = jnp.log2(f0 + pitch_config["pitch_norm_eps"])
    if uv is not None and pitch_config["use_uv"]:
        f0 = jnp.where(uv > 0, 0.0, f0)
    return f0


def denorm_f0(f0, uv, pitch_config, pitch_padding=None, min=None, max=None):
    """Inverse of norm_f0; optionally clamp and zero uv/padding frames."""
    if pitch_config["pitch_norm"] == "standard":
        f0 = f0 * pitch_config["f0_std"] + pitch_config["f0_mean"]
    elif pitch_config["pitch_norm"] == "log":
        f0 = 2.0 ** jnp.clip(f0, -20.0, 20.0)   # clip: avoid inf on garbage
    if min is not None:
        f0 = jnp.maximum(f0, min)
    if max is not None:
        f0 = jnp.minimum(f0, max)
    if uv is not None and pitch_config["use_uv"]:
        f0 = jnp.where(uv > 0, 0.0, f0)
    if pitch_padding is not None:
        f0 = jnp.where(pitch_padding, 0.0, f0)
    return f0


def expand_f0_ph(f0, mel2ph, pitch_config):
    """Phoneme-level f0 → frame level via mel2ph gather
    (utils/pitch_tools.py:135-139)."""
    from ctts_tpu.ops.length_regulator import gather_by_mel2ph
    f0 = denorm_f0(f0, None, pitch_config)
    return gather_by_mel2ph(f0, mel2ph)

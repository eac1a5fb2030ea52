"""Parity test: JAX HiFi-GAN generator vs the reference torch implementation
with ported weights (reference loaded from /root/reference, never copied)."""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _load_ref_generator():
    sys.path.insert(0, REF)
    try:
        from hifigan import Generator, AttrDict
    finally:
        sys.path.remove(REF)
    with open(f"{REF}/hifigan/config.json") as f:
        cfg = AttrDict(json.load(f))
    torch.manual_seed(0)
    gen = Generator(cfg)
    gen.remove_weight_norm()
    gen.eval()
    return gen


def test_hifigan_matches_torch_reference(tmp_path):
    from ctts_tpu.vocoder.hifigan import (HiFiGANGenerator,
                                          load_torch_generator)

    gen = _load_ref_generator()
    path = tmp_path / "generator.pth.tar"
    torch.save({"generator": gen.state_dict()}, path)

    variables, cfg = load_torch_generator(str(path))
    model = HiFiGANGenerator(cfg)

    rng = np.random.RandomState(0)
    mel = rng.randn(2, 37, 80).astype(np.float32) * 2 - 5

    with torch.no_grad():
        ref = gen(torch.from_numpy(mel).transpose(1, 2)).squeeze(1).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(mel)))

    assert got.shape == ref.shape == (2, 37 * 256)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_subpixel_upsample_equals_conv_transpose(monkeypatch):
    """The subpixel reformulation is the same math as the strided transposed
    conv (see _ConvTranspose docstring) — check both lowerings agree for
    every (k, u) in the V1 config."""
    from ctts_tpu.vocoder.hifigan import _ConvTranspose, V1_CONFIG

    rng = np.random.RandomState(1)
    for k, u in zip(V1_CONFIG["upsample_kernel_sizes"],
                    V1_CONFIG["upsample_rates"]):
        m = _ConvTranspose(features=24, kernel_size=k, stride=u)
        x = jnp.asarray(rng.randn(2, 19, 16).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), x)
        monkeypatch.setenv("CTTS_SUBPIX", "1")
        sub = m.apply(variables, x)
        monkeypatch.setenv("CTTS_SUBPIX", "0")
        ref = m.apply(variables, x)
        assert sub.shape == ref.shape == (2, 19 * u, 24)
        np.testing.assert_allclose(np.asarray(sub), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

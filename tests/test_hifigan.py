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

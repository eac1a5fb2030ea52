"""MelGAN parity: JAX generator vs a torch reconstruction of the
descriptinc/melgan-neurips generator with ported weights."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
from torch.nn.utils import weight_norm  # noqa: E402


def _torch_melgan(input_size=80, ngf=32, n_residual_layers=3,
                  ratios=(8, 8, 2, 2)):
    """descript melgan-neurips Generator structure (public architecture)."""

    def WNConv1d(*a, **k):
        return weight_norm(tnn.Conv1d(*a, **k))

    def WNConvTranspose1d(*a, **k):
        return weight_norm(tnn.ConvTranspose1d(*a, **k))

    class ResnetBlock(tnn.Module):
        def __init__(self, dim, dilation=1):
            super().__init__()
            self.block = tnn.Sequential(
                tnn.LeakyReLU(0.2),
                tnn.ReflectionPad1d(dilation),
                WNConv1d(dim, dim, kernel_size=3, dilation=dilation),
                tnn.LeakyReLU(0.2),
                WNConv1d(dim, dim, kernel_size=1),
            )
            self.shortcut = WNConv1d(dim, dim, kernel_size=1)

        def forward(self, x):
            return self.shortcut(x) + self.block(x)

    mult = int(2 ** len(ratios))
    model = [tnn.ReflectionPad1d(3),
             WNConv1d(input_size, mult * ngf, kernel_size=7, padding=0)]
    for r in ratios:
        model += [tnn.LeakyReLU(0.2),
                  WNConvTranspose1d(mult * ngf, mult * ngf // 2,
                                    kernel_size=r * 2, stride=r,
                                    padding=r // 2 + r % 2,
                                    output_padding=r % 2)]
        for j in range(n_residual_layers):
            model += [ResnetBlock(mult * ngf // 2, dilation=3 ** j)]
        mult //= 2
    model += [tnn.LeakyReLU(0.2), tnn.ReflectionPad1d(3),
              WNConv1d(ngf, 1, kernel_size=7, padding=0), tnn.Tanh()]
    return tnn.Sequential(*model)


def test_melgan_matches_torch(tmp_path):
    from ctts_tpu.vocoder.melgan import MelGANGenerator, load_torch_melgan

    torch.manual_seed(0)
    gen = _torch_melgan().eval()
    path = tmp_path / "melgan.pt"
    torch.save(gen.state_dict(), path)

    variables = load_torch_melgan(str(path))
    model = MelGANGenerator()

    rng = np.random.RandomState(0)
    mel = rng.randn(2, 23, 80).astype(np.float32) * 1.5 - 2

    with torch.no_grad():
        ref = gen(torch.from_numpy(mel).transpose(1, 2)).squeeze(1).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(mel)))
    assert got.shape == ref.shape == (2, 23 * 256)
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)


def test_melgan_import_rejects_wrong_layout(tmp_path):
    """A non-descript state_dict must raise a descriptive ValueError (not an
    opaque KeyError) naming the discovered layout."""
    from ctts_tpu.vocoder.melgan import load_torch_melgan
    bogus = {"encoder.0.weight": torch.randn(4, 4, 3),
             "decoder.0.weight": torch.randn(4, 4, 3)}
    p = str(tmp_path / "bogus.pt")
    torch.save(bogus, p)
    with pytest.raises(ValueError, match="melgan import"):
        load_torch_melgan(p)

    # right family, wrong stage count: 2 upsamplers but 4 ratios requested
    trunk = _torch_melgan(ratios=(8, 8))
    p2 = str(tmp_path / "two_stage.pt")
    torch.save(trunk.state_dict(), p2)
    with pytest.raises(ValueError, match="upsample convs"):
        load_torch_melgan(p2, ratios=(8, 8, 2, 2))

"""Reference-grade figure surface (ctts_tpu/utils/figures.py vs the
reference's synth_one_sample, ref utils/tools.py:206-313): every pitch
type, energy level, prosody mode and alignment mode produces the same
figure set the reference logs to TensorBoard."""

import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_configs, synth_batch
from ctts_tpu.models.comp_trans_tts import CompTransTTS
from ctts_tpu.utils.figures import (energy_to_figure, f0_to_figure,
                                    spec_to_figure, synth_sample_figures)


def _run(pre, mod, tr, batch, mode):
    model = CompTransTTS(pre, mod, tr)
    kwargs = dict(
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], mode=mode,
        mels=batch["mels"], mel_lens=batch["mel_lens"],
        pitch_targets=batch["pitch_data"], energy_targets=batch["energies"],
        duration_targets=batch["durations"],
        attn_priors=batch["attn_priors"] if mode == "train_unsup" else None,
        step=jnp.asarray(10), deterministic=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, **kwargs)
    out, _ = model.apply(variables, mutable=["batch_stats"], **kwargs)
    return out


def test_unsup_cwt_figures():
    """cwt pitch + learned alignment: mel, f0 (gt+cwt+pred overlays), cwt
    panel, energy, and the soft/hard/PRIOR attention trio."""
    pre, mod, tr = tiny_configs(energy_feature="frame_level")
    batch = synth_batch()
    out = _run(pre, mod, tr, batch, "train_unsup")
    figs, fig_attn = synth_sample_figures(batch, out, pre, mod)
    assert set(figs) == {"mel", "f0", "cwt", "energy"}
    assert fig_attn is not None
    # the prior panel is present: three axes in the trio
    assert len(fig_attn.axes) == 3
    # f0 figure overlays gt + cwt-reconstruction + prediction
    assert len(figs["f0"].axes[0].lines) == 3
    assert len(figs["energy"].axes[0].lines) == 2
    import matplotlib.pyplot as plt
    plt.close("all")


def test_sup_frame_pitch_figures():
    """frame pitch + supervised durations: no attention trio, f0 gt+pred."""
    pre, mod, tr = tiny_configs(learn_alignment=False, pitch_type="frame",
                                energy_feature="frame_level")
    batch = synth_batch(sup=True, pitch_type="frame")
    out = _run(pre, mod, tr, batch, "train_sup")
    figs, fig_attn = synth_sample_figures(batch, out, pre, mod)
    assert fig_attn is None
    assert set(figs) == {"mel", "f0", "energy"}
    assert len(figs["f0"].axes[0].lines) == 2          # gt + pred
    import matplotlib.pyplot as plt
    plt.close("all")


def test_sup_ph_pitch_phoneme_energy_figures():
    """ph pitch: phone-level contours expanded to frames via mel2ph;
    phoneme-level energy expanded by predicted durations."""
    pre, mod, tr = tiny_configs(learn_alignment=False, pitch_type="ph",
                                energy_feature="frame_level")
    batch = synth_batch(sup=True, pitch_type="frame")
    out = _run(pre, mod, tr, batch, "train_sup")
    figs, _ = synth_sample_figures(batch, out, pre, mod)
    mel_len = int(np.asarray(out["mel_lens"])[0])
    for line in figs["f0"].axes[0].lines:
        assert line.get_xdata().shape[0] == mel_len    # frame resolution
    import matplotlib.pyplot as plt
    plt.close("all")


def test_liu2021_prosody_alignment_panel():
    pre, mod, tr = tiny_configs(prosody="liu2021",
                                energy_feature="frame_level")
    batch = synth_batch()
    out = _run(pre, mod, tr, batch, "train_unsup")
    figs, _ = synth_sample_figures(batch, out, pre, mod)
    # mel figure gains the prosody-alignment panel (ref tools.py:286-296)
    assert len(figs["mel"].axes) == 3
    import matplotlib.pyplot as plt
    plt.close("all")


def test_figure_helpers_standalone():
    f = f0_to_figure(np.ones(10) * 100, np.ones(10) * 110, np.ones(10) * 90)
    assert len(f.axes[0].lines) == 3
    e = energy_to_figure(np.ones(10), np.ones(10) * 2)
    assert len(e.axes[0].lines) == 2
    s = spec_to_figure(np.random.RandomState(0).rand(20, 20))
    assert s is not None
    import matplotlib.pyplot as plt
    plt.close("all")

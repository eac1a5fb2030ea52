"""Synthesis path: tiny model → mel → vocoder fallback → wav+png files."""

import os
import sys

import numpy as np
import jax

from helpers import tiny_configs

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_preprocess_english_graphemes():
    from synthesize import preprocess_english
    pre, _, _ = tiny_configs()
    pre["path"]["lexicon_path"] = "/nonexistent"
    seq = preprocess_english("Hello world", pre)
    assert len(seq) > 0 and seq.dtype.kind in "iu"


def test_synthesize_writes_outputs(tmp_path):
    import synthesize as syn
    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)

    pre, mod, tr = tiny_configs()
    mod = prepare_model_config(pre, mod)
    model = CompTransTTS(pre, mod, tr)
    import jax.numpy as jnp
    texts = jnp.asarray(np.random.RandomState(0).randint(1, 300, (1, 8)),
                        jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           speakers=jnp.zeros(1, jnp.int32), texts=texts,
                           src_lens=jnp.full((1,), 8, jnp.int32),
                           mode="infer", max_mel_len=64, deterministic=True)
    batch = {
        "ids": ["smoke"], "raw_texts": ["smoke"],
        "speakers": np.zeros(1, np.int32),
        "texts": np.asarray(texts), "src_lens": np.array([8], np.int32),
        "spker_embeds": None,
    }
    vocoder = ("griffin_lim", None, None)
    result_dir = str(tmp_path / "out")
    syn.synthesize(model, variables, batch, (pre, mod, tr), vocoder,
                   (1.0, 1.0, 1.0), result_dir, max_mel_len=64)
    assert os.path.exists(os.path.join(result_dir, "smoke.wav"))
    assert os.path.exists(os.path.join(result_dir, "smoke.png"))
    from scipy.io import wavfile
    sr, wav = wavfile.read(os.path.join(result_dir, "smoke.wav"))
    assert sr == 22050 and wav.dtype == np.int16 and len(wav) > 0

    # --stream_chunk path: chunked vocoding through a real generator must
    # write the same-length wav as the full-pass vocode of the same mel
    import jax.numpy as jnp
    from ctts_tpu.vocoder.hifigan import HiFiGANGenerator, V1_CONFIG
    gen = HiFiGANGenerator(dict(V1_CONFIG, upsample_initial_channel=32))
    gvar = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 80),
                                                     jnp.float32))
    stream_dir = str(tmp_path / "stream")
    syn.synthesize(model, variables, batch, (pre, mod, tr),
                   ("HiFi-GAN", gen, gvar), (1.0, 1.0, 1.0), stream_dir,
                   max_mel_len=64, stream_chunk=16)
    sr2, wav2 = wavfile.read(os.path.join(stream_dir, "smoke.wav"))
    assert sr2 == 22050 and wav2.dtype == np.int16
    full_dir = str(tmp_path / "full")
    syn.synthesize(model, variables, batch, (pre, mod, tr),
                   ("HiFi-GAN", gen, gvar), (1.0, 1.0, 1.0), full_dir,
                   max_mel_len=64, stream_chunk=0)
    _, wav3 = wavfile.read(os.path.join(full_dir, "smoke.wav"))
    assert wav2.shape == wav3.shape
    assert np.abs(wav2.astype(np.int32) - wav3.astype(np.int32)).max() <= 1

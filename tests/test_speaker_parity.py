"""DeepSpeaker embedding parity vs the ACTUAL reference Keras ResCNN.

Builds the reference model (deepspeaker/conv_models.py) with real
TensorFlow, random-initialized, saves a legacy .h5 checkpoint (the same
layout as the published ResCNN_triplet_training_checkpoint_265.h5), ports it
through ctts_tpu.models.speaker.load_keras_weights, and compares embeddings.
"""

import os
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

REF = "/root/reference"


@pytest.fixture(scope="module")
def keras_ref():
    # the deepspeaker package may have been stubbed by ref_stubs in another
    # test module of this session — evict stubs so the real one loads
    for name in [m for m in sys.modules
                 if m == "deepspeaker" or m.startswith("deepspeaker.")]:
        mod = sys.modules[name]
        if not getattr(mod, "__file__", None):
            del sys.modules[name]
    sys.path.insert(0, REF)
    from tensorflow.keras import regularizers
    orig_l2 = regularizers.l2
    # Keras 3 renamed the l2(l=...) kwarg; regularizers don't affect
    # inference, shim it for construction
    regularizers.l2 = lambda l=0.01, **kw: orig_l2(l)
    try:
        from deepspeaker.conv_models import DeepSpeakerModel
        tf.keras.utils.set_random_seed(0)
        model = DeepSpeakerModel()
        yield model
    finally:
        regularizers.l2 = orig_l2
        sys.path.remove(REF)


def test_rescnn_embedding_parity(keras_ref, tmp_path):
    from ctts_tpu.models.speaker import (ResCNN, load_keras_weights,
                                         NUM_FRAMES, NUM_FBANKS)
    import jax
    import jax.numpy as jnp

    ckpt = str(tmp_path / "rescnn.h5")
    keras_ref.m.save(ckpt)   # legacy full-model h5 with model_weights group

    rng = np.random.RandomState(0)
    x = rng.randn(2, NUM_FRAMES, NUM_FBANKS, 1).astype(np.float32)
    ref_emb = keras_ref.m.predict(x, verbose=0)

    model = ResCNN()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ported = load_keras_weights(ckpt, variables)
    emb = np.asarray(model.apply(ported, jnp.asarray(x)))

    cos = (emb * ref_emb).sum(-1)        # both are L2-normalized
    assert np.all(cos > 0.9999), cos
    assert np.abs(emb - ref_emb).mean() < 1e-4


def test_embedder_fails_loudly_without_weights(tmp_path, monkeypatch):
    from ctts_tpu.models.speaker import PreDefinedEmbedder
    monkeypatch.delenv("CTTS_ALLOW_RANDOM_SPEAKER", raising=False)
    monkeypatch.delenv("CTTS_DEEPSPEAKER_H5", raising=False)
    cfg = {"preprocessing": {"audio": {"sampling_rate": 22050}}, "path": {}}
    with pytest.raises(RuntimeError, match="DeepSpeaker pretrained weights"):
        PreDefinedEmbedder(cfg)
    # explicit opt-in works and produces consistent random-net features
    monkeypatch.setenv("CTTS_ALLOW_RANDOM_SPEAKER", "1")
    emb = PreDefinedEmbedder(cfg)
    wav = np.random.RandomState(0).randn(22050).astype(np.float32)
    e1, e2 = emb(wav), emb(wav)
    assert e1.shape == (1, 512)
    np.testing.assert_allclose(e1, e2)

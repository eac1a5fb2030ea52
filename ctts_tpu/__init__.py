"""TPU-native rebuild of Comprehensive-Transformer-TTS (JAX/XLA/Pallas).

Public surface:
    get_configs_of          — dataset config loader (reference parity)
    CompTransTTS            — the acoustic model (flax)
    prepare_model_config    — inject dataset-derived constants
    text_to_sequence        — text frontend
"""

__version__ = "0.1.0"

from ctts_tpu.config import get_configs_of  # noqa: F401


def __getattr__(name):
    # lazy imports keep `import ctts_tpu` light (no jax/flax at import time)
    if name == "CompTransTTS":
        from ctts_tpu.models.comp_trans_tts import CompTransTTS
        return CompTransTTS
    if name == "prepare_model_config":
        from ctts_tpu.models.comp_trans_tts import prepare_model_config
        return prepare_model_config
    if name == "text_to_sequence":
        from ctts_tpu.text import text_to_sequence
        return text_to_sequence
    raise AttributeError(name)

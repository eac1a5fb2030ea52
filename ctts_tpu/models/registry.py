"""block_type → (TextEncoder, Decoder) registry.

Mirrors the reference's import-time dispatch (model/CompTransTTS.py:19-32)
as an explicit registry. All blocks share one interface:
``TextEncoder(config)(tokens, src_padding_mask) -> (hidden, token_emb)`` and
``Decoder(config)(x, mel_padding_mask) -> (y, mask)``.
"""

import importlib

_BLOCKS = {
    "transformer_fs2": "ctts_tpu.models.transformer_fs2",
    "transformer": "ctts_tpu.models.transformer",
    "fastformer": "ctts_tpu.models.fastformer",
    "lstransformer": "ctts_tpu.models.lstransformer",
    "conformer": "ctts_tpu.models.conformer",
    "reformer": "ctts_tpu.models.reformer",
}


def get_block(block_type):
    if block_type not in _BLOCKS:
        raise NotImplementedError(
            f"unknown block_type {block_type!r}; choose from {sorted(_BLOCKS)}")
    mod = importlib.import_module(_BLOCKS[block_type])
    return mod.TextEncoder, mod.Decoder


def block_hidden(model_config):
    """encoder/decoder hidden size for the selected block."""
    bt = model_config["block_type"]
    key = bt if bt in model_config else "transformer"
    cfg = model_config[key]
    if "encoder_hidden" in cfg:
        return cfg["encoder_hidden"], cfg["decoder_hidden"]
    # reformer config carries no hidden → fall back to transformer's
    h = model_config["transformer"]["encoder_hidden"]
    return h, model_config["transformer"]["decoder_hidden"]

"""Global symbol table for text input.

ID layout is identical to the reference frontend (reference: text/symbols.py)
— pad, special, punctuation, letters, @ARPAbet, @pinyin, silences — so token
sequences and embedding rows are interchangeable with reference checkpoints.
"""

from ctts_tpu.text import cmudict, pinyin

_pad = "_"
_punctuation = "!'(),.:;? "
_special = "-"
_silences = ["@sp", "@spn", "@sil"]

# "@" prefix keeps ARPAbet/pinyin symbols distinct from raw letters.
_arpabet = ["@" + s for s in cmudict.valid_symbols]
_pinyin = ["@" + s for s in pinyin.valid_symbols]

symbols = (
    [_pad]
    + list(_special)
    + list(_punctuation)
    + list("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz")
    + _arpabet
    + _pinyin
    + _silences
)

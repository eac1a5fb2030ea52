"""Text frontend: grapheme/phoneme sequences → symbol IDs.

API parity with the reference frontend (reference: text/__init__.py):
``text_to_sequence``, ``sequence_to_text``, ``grapheme_to_phoneme``,
``sil_phonemes_ids``. ARPAbet runs are embedded in ``{...}`` curly braces.
"""

import re

from ctts_tpu.text import cleaners
from ctts_tpu.text.symbols import symbols, _silences

_symbol_to_id = {s: i for i, s in enumerate(symbols)}
_id_to_symbol = {i: s for i, s in enumerate(symbols)}

_curly_re = re.compile(r"(.*?)\{(.+?)\}(.*)")


def text_to_sequence(text, cleaner_names):
    """Convert a text string (with optional {ARPAbet} spans) to symbol IDs."""
    sequence = []
    while len(text):
        m = _curly_re.match(text)
        if not m:
            sequence += _symbols_to_sequence(_clean_text(text, cleaner_names))
            break
        sequence += _symbols_to_sequence(_clean_text(m.group(1), cleaner_names))
        sequence += _arpabet_to_sequence(m.group(2))
        text = m.group(3)
    return sequence


def grapheme_to_phoneme(text, g2p):
    """Run a word-level g2p callable over text, dropping bare spaces."""
    phones = []
    words = filter(None, re.split(r"([,;.\-\?\!\s+])", text))
    for w in words:
        phones += [p for p in g2p(w) if p != " "]
    return phones


def sequence_to_text(sequence):
    """Inverse of text_to_sequence (phones re-wrapped in curly braces)."""
    result = ""
    for symbol_id in sequence:
        s = _id_to_symbol.get(symbol_id)
        if s is None:
            continue
        if len(s) > 1 and s[0] == "@":
            s = "{%s}" % s[1:]
        result += s
    return result.replace("}{", " ")


def sil_phonemes_ids():
    """Symbol IDs of the silence phones (@sp/@spn/@sil)."""
    return [_symbol_to_id[s] for s in _silences]


def _clean_text(text, cleaner_names):
    for name in cleaner_names:
        cleaner = getattr(cleaners, name, None)
        if cleaner is None:
            raise ValueError("Unknown cleaner: %s" % name)
        text = cleaner(text)
    return text


def _symbols_to_sequence(syms):
    return [_symbol_to_id[s] for s in syms if s in _symbol_to_id and s != "_"]


def _arpabet_to_sequence(text):
    return _symbols_to_sequence(["@" + s for s in text.split()])

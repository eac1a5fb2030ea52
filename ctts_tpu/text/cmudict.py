"""ARPAbet phone inventory + optional CMU pronouncing-dictionary loader.

Provides the same public surface as the reference text frontend
(reference: text/cmudict.py): ``valid_symbols`` and a ``CMUDict`` class that
parses the plain-text cmudict format. The dictionary file itself is an
external download; everything here works without it.
"""

import re

_PHONES = ["AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY",
           "IH", "IY", "OW", "OY", "UH", "UW"]
_CONSONANTS = ["B", "CH", "D", "DH", "F", "G", "HH", "JH", "K", "L", "M",
               "N", "NG", "P", "R", "S", "SH", "T", "TH", "V", "W", "Y",
               "Z", "ZH"]

# Vowels carry stress markers 0/1/2 in addition to the bare form; the table
# order (vowel groups sorted alphabetically, consonants interleaved) matches
# the canonical keithito/tacotron inventory so symbol IDs line up with the
# reference checkpoints (reference: text/cmudict.py:6-95).
valid_symbols = []
for v in sorted(_PHONES + _CONSONANTS):
    valid_symbols.append(v)
    if v in _PHONES:
        valid_symbols.extend([v + "0", v + "1", v + "2"])

_valid_symbol_set = set(valid_symbols)

_alt_re = re.compile(r"\([0-9]+\)")


class CMUDict:
    """Thin wrapper around a cmudict-formatted pronunciation file."""

    def __init__(self, file_or_path, keep_ambiguous=True):
        if isinstance(file_or_path, str):
            with open(file_or_path, encoding="latin-1") as f:
                entries = _parse_cmudict(f)
        else:
            entries = _parse_cmudict(file_or_path)
        if not keep_ambiguous:
            entries = {w: p for w, p in entries.items() if len(p) == 1}
        self._entries = entries

    def __len__(self):
        return len(self._entries)

    def lookup(self, word):
        """Return list of ARPAbet pronunciation strings for ``word``."""
        return self._entries.get(word.upper())


def _parse_cmudict(f):
    cmudict = {}
    for line in f:
        if len(line) and (line[0] >= "A" and line[0] <= "Z" or line[0] == "'"):
            parts = line.split("  ")
            word = re.sub(_alt_re, "", parts[0])
            pron = _get_pronunciation(parts[1])
            if pron:
                cmudict.setdefault(word, []).append(pron)
    return cmudict


def _get_pronunciation(s):
    parts = s.strip().split(" ")
    for part in parts:
        if part not in _valid_symbol_set:
            return None
    return " ".join(parts)

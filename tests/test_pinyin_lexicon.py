"""Generated pinyin lexicon must be an exact superset of the reference's
shipped data file (when available)."""

import os

import pytest

REF_LEX = "/root/reference/lexicon/pinyin-lexicon-r.txt"


def test_generated_lexicon_supersets_reference():
    from ctts_tpu.text.pinyin_lexicon import build_lexicon
    from ctts_tpu.text.pinyin import valid_symbols

    lex = build_lexicon()
    assert len(lex) > 4000
    valid = set(valid_symbols)
    for key, phones in lex.items():
        for p in phones:
            assert p in valid, (key, p)

    if not os.path.exists(REF_LEX):
        pytest.skip("reference lexicon unavailable")
    ref = {}
    with open(REF_LEX) as f:
        for line in f:
            parts = line.split()
            ref[parts[0]] = parts[1:]
    missing = [k for k in ref if k not in lex]
    diff = [k for k in ref if k in lex and ref[k] != lex[k]]
    assert not missing, missing[:10]
    assert not diff, [(k, ref[k], lex[k]) for k in diff[:5]]

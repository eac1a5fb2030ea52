import pytest

from ctts_tpu.text import (text_to_sequence, sequence_to_text,
                           sil_phonemes_ids)
from ctts_tpu.text.symbols import symbols
from ctts_tpu.text.numbers import normalize_numbers, spell_ordinal


def test_symbol_table_layout():
    # pad, special, punctuation, letters, 84 arpabet, 209 pinyin, 3 silences
    assert symbols[0] == "_"
    assert symbols[1] == "-"
    assert len(symbols) == 1 + 1 + 10 + 52 + 84 + 209 + 3
    assert symbols[-3:] == ["@sp", "@spn", "@sil"]
    assert "@AA1" in symbols and "@zh" in symbols and "@rr" in symbols
    assert len(set(symbols)) == len(symbols)


def test_text_roundtrip_arpabet():
    seq = text_to_sequence("Turn left on {HH AW1 S} Street.",
                           ["english_cleaners"])
    assert all(isinstance(i, int) and 0 < i < len(symbols) for i in seq)
    text = sequence_to_text(seq)
    assert "{HH AW1 S}" in text


def test_sil_ids():
    ids = sil_phonemes_ids()
    assert [symbols[i] for i in ids] == ["@sp", "@spn", "@sil"]


@pytest.mark.parametrize("inp,out", [
    ("I have $3.50.", "i have three dollars, fifty cents."),
    ("chapter 11", "chapter eleven"),
    ("in 1984 there", "in nineteen eighty-four there"),
    ("in 1005 there", "in ten oh five there"),
    ("the 2nd and 23rd", "the second and twenty-third"),
    ("1,234 things", "twelve thirty-four things"),
    ("4,234 things", "four thousand two hundred thirty-four things"),
    ("3.14 pie", "three point fourteen pie"),
])
def test_number_expansion(inp, out):
    assert normalize_numbers(inp.lower()) == out


def test_ordinals():
    assert spell_ordinal(1) == "first"
    assert spell_ordinal(12) == "twelfth"
    assert spell_ordinal(20) == "twentieth"
    assert spell_ordinal(21) == "twenty-first"
    assert spell_ordinal(100) == "one hundredth"


def test_cleaners_ascii():
    seq = text_to_sequence("Café naïve — test", ["english_cleaners"])
    assert sequence_to_text(seq) == "cafe naive - test"

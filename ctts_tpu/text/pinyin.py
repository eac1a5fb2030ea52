"""Mandarin pinyin phone inventory (initials + tonal finals + erhua "rr").

Same inventory as the reference frontend (reference: text/pinyin.py) so that
symbol IDs agree. The optional hanzi→pinyin conversion used by the Mandarin
synthesis path lives behind a lazy pypinyin import in the CLI, not here.
"""

initials = [
    "b", "c", "ch", "d", "f", "g", "h", "j", "k", "l", "m", "n", "p", "q",
    "r", "s", "sh", "t", "w", "x", "y", "z", "zh",
]

_final_stems = [
    "a", "ai", "an", "ang", "ao", "e", "ei", "en", "eng", "er", "i", "ia",
    "ian", "iang", "iao", "ie", "ii", "iii", "in", "ing", "iong", "iou",
    "o", "ong", "ou", "u", "ua", "uai", "uan", "uang", "uei", "uen", "uo",
    "v", "van", "ve", "vn",
]

# Five tones per final (tone 5 = neutral).
finals = [s + str(t) for s in _final_stems for t in range(1, 6)]

valid_symbols = initials + finals + ["rr"]

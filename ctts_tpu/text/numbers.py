"""Number → spoken-English normalization, dependency-free.

Equivalent in behavior to the reference's inflect-based normalizer
(reference: text/numbers.py): expands currency, ordinals, decimals, years and
plain cardinals inside free text. Implemented with a built-in cardinal/ordinal
speller so no external packages are needed.
"""

import re

_comma_number_re = re.compile(r"([0-9][0-9\,]+[0-9])")
_decimal_number_re = re.compile(r"([0-9]+\.[0-9]+)")
_pounds_re = re.compile(r"£([0-9\,]*[0-9]+)")
_dollars_re = re.compile(r"\$([0-9\.\,]*[0-9]+)")
_ordinal_re = re.compile(r"[0-9]+(st|nd|rd|th)")
_number_re = re.compile(r"[0-9]+")

_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
         "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]
_SCALES = [(10 ** 9, "billion"), (10 ** 6, "million"), (10 ** 3, "thousand"),
           (100, "hundred")]

_ORDINAL_IRREGULAR = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def _spell_below_100(n):
    if n < 20:
        return _ONES[n]
    tens, ones = divmod(n, 10)
    return _TENS[tens] + ("-" + _ONES[ones] if ones else "")


def spell_cardinal(n):
    """Spell a non-negative integer in English words."""
    if n < 100:
        return _spell_below_100(n)
    for scale, name in _SCALES:
        if n >= scale:
            head, rest = divmod(n, scale)
            out = spell_cardinal(head) + " " + name
            if rest:
                out += " " + spell_cardinal(rest)
            return out
    return _spell_below_100(n)


def spell_ordinal(n):
    """Spell a non-negative integer as an English ordinal."""
    words = spell_cardinal(n)
    head, _, last = words.rpartition(" ")
    hy_head, hy_sep, hy_last = last.rpartition("-")
    tail = hy_last
    if tail in _ORDINAL_IRREGULAR:
        tail = _ORDINAL_IRREGULAR[tail]
    elif tail.endswith("y"):
        tail = tail[:-1] + "ieth"
    else:
        tail = tail + "th"
    last = hy_head + hy_sep + tail
    return (head + " " + last) if head else last


def _spell_year(n):
    """Read a 4-digit number the way inflect's group-2/zero="oh" mode does
    (1984 → nineteen eighty-four, 1005 → ten oh five)."""
    hi, lo = divmod(n, 100)
    if lo == 0:
        return spell_cardinal(hi) + " hundred"
    if lo < 10:
        return spell_cardinal(hi) + " oh " + _ONES[lo]
    return spell_cardinal(hi) + " " + _spell_below_100(lo)


def _remove_commas(m):
    return m.group(1).replace(",", "")


def _expand_decimal_point(m):
    # digits re-expanded by the trailing cardinal pass, like the reference
    return m.group(1).replace(".", " point ")


def _expand_dollars(m):
    match = m.group(1)
    parts = match.split(".")
    if len(parts) > 2:
        return match + " dollars"
    dollars = int(parts[0]) if parts[0] else 0
    cents = int(parts[1]) if len(parts) > 1 and parts[1] else 0
    if dollars and cents:
        dollar_unit = "dollar" if dollars == 1 else "dollars"
        cent_unit = "cent" if cents == 1 else "cents"
        return "%s %s, %s %s" % (dollars, dollar_unit, cents, cent_unit)
    if dollars:
        dollar_unit = "dollar" if dollars == 1 else "dollars"
        return "%s %s" % (dollars, dollar_unit)
    if cents:
        cent_unit = "cent" if cents == 1 else "cents"
        return "%s %s" % (cents, cent_unit)
    return "zero dollars"


def _expand_pounds(m):
    return m.group(1).replace(",", "") + " pounds"


def _expand_ordinal(m):
    return spell_ordinal(int(m.group(0)[:-2]))


def _expand_number(m):
    num = int(m.group(0))
    if 1000 < num < 3000:
        if num == 2000:
            return "two thousand"
        if 2000 < num < 2010:
            return "two thousand " + spell_cardinal(num % 100)
        if num % 100 == 0:
            return spell_cardinal(num // 100) + " hundred"
        return _spell_year(num)        # group-2 "year" reading
    return spell_cardinal(num)


def normalize_numbers(text):
    text = re.sub(_comma_number_re, _remove_commas, text)
    text = re.sub(_pounds_re, _expand_pounds, text)
    text = re.sub(_dollars_re, _expand_dollars, text)
    text = re.sub(_decimal_number_re, _expand_decimal_point, text)
    text = re.sub(_ordinal_re, _expand_ordinal, text)
    text = re.sub(_number_re, _expand_number, text)
    return text

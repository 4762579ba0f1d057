"""Phonetic encodings implemented from scratch (public algorithms).

* American Soundex — the reference uses BigQuery ``SOUNDEX`` for the fuzzy
  name leg (``batch_mdm_gcp/bigquery_utils.py:361-366``); equal codes score a
  fixed 0.8. Classic rules: keep first letter; map consonants to digits
  (bfpv→1, cgjkqsxz→2, dt→3, l→4, mn→5, r→6); collapse adjacent equal digits,
  including across H/W; vowels (AEIOUY) break runs; pad/truncate to 4 chars.

* Metaphone (Lawrence Philips, 1990) — not in the reference; required by the
  north-star as an additional normalized-name blocking key. This is a compact
  implementation of the original (single) Metaphone transformation rules.

Both operate on already-cleaned names (uppercase A-Z + spaces). They are
per-string Python but only run once per record during blocking-key generation
(never in the O(pairs) hot path), batched inside ``map_batches``.
"""

from __future__ import annotations

_SOUNDEX_MAP = {}
for digit, letters in (
    ("1", "BFPV"),
    ("2", "CGJKQSXZ"),
    ("3", "DT"),
    ("4", "L"),
    ("5", "MN"),
    ("6", "R"),
):
    for ch in letters:
        _SOUNDEX_MAP[ch] = digit

_VOWELS = set("AEIOUY")


def soundex(name: str | None) -> str:
    """American Soundex of the first alphabetic word-run of ``name``.

    Returns '' for null/empty/non-alphabetic input (so it never collides with
    a real code when used as a blocking key).
    """
    if not name:
        return ""
    s = [c for c in name.upper() if "A" <= c <= "Z"]
    if not s:
        return ""
    first = s[0]
    code = [first]
    prev_digit = _SOUNDEX_MAP.get(first, "")
    for ch in s[1:]:
        if ch in ("H", "W"):
            # H/W are transparent: do not reset prev_digit
            continue
        d = _SOUNDEX_MAP.get(ch, "")
        if d:
            if d != prev_digit:
                code.append(d)
                if len(code) == 4:
                    break
            prev_digit = d
        else:
            # vowel: breaks the run
            prev_digit = ""
    return ("".join(code) + "000")[:4]


# ---- Metaphone ---------------------------------------------------------------

def metaphone(name: str | None, max_len: int = 6) -> str:
    """Original Metaphone code of the first word-run of ``name`` (A-Z only).

    Compact implementation of Philips' 1990 rules; '' for empty input.
    """
    if not name:
        return ""
    w = "".join(c for c in name.upper() if "A" <= c <= "Z")
    if not w:
        return ""

    out: list[str] = []
    n = len(w)

    def ch(i: int) -> str:
        return w[i] if 0 <= i < n else ""

    i = 0
    # initial-letter exceptions
    if w.startswith(("AE", "GN", "KN", "PN", "WR")):
        i = 1
    elif w.startswith("X"):
        out.append("S")
        i = 1
    elif w.startswith("WH"):
        out.append("W")
        i = 2

    while i < n and len(out) < max_len:
        c = w[i]
        # drop duplicate adjacent letters except C
        if c != "C" and i > 0 and ch(i - 1) == c:
            i += 1
            continue
        if c in "AEIOU":
            if i == 0:
                out.append(c)
        elif c == "B":
            if not (i == n - 1 and ch(i - 1) == "M"):
                out.append("B")
        elif c == "C":
            if ch(i + 1) == "I" and ch(i + 2) == "A":
                out.append("X")
            elif ch(i + 1) == "H":
                if i > 0 and ch(i - 1) == "S":
                    out.append("K")
                else:
                    out.append("X")
                i += 1
            elif ch(i + 1) in "IEY":
                out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if ch(i + 1) == "G" and ch(i + 2) in "EYI":
                out.append("J")
                i += 2
            else:
                out.append("T")
        elif c == "G":
            if ch(i + 1) == "H":
                if not (i + 1 == n - 1 or ch(i + 2) in "AEIOU"):
                    i += 1  # silent GH
                else:
                    out.append("K")
                    i += 1
            elif ch(i + 1) == "N":
                pass  # silent in GN / GNED
            elif ch(i + 1) in "IEY":
                out.append("J")
            else:
                out.append("K")
        elif c == "H":
            if i > 0 and ch(i - 1) in "AEIOU" and ch(i + 1) not in "AEIOU":
                pass  # silent
            elif i > 0 and ch(i - 1) in "CSPTG":
                pass  # handled by digraph rules
            else:
                out.append("H")
        elif c in "FJLMNR":
            out.append(c)
        elif c == "K":
            if not (i > 0 and ch(i - 1) == "C"):
                out.append("K")
        elif c == "P":
            if ch(i + 1) == "H":
                out.append("F")
                i += 1
            else:
                out.append("P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if ch(i + 1) == "H":
                out.append("X")
                i += 1
            elif ch(i + 1) == "I" and ch(i + 2) in "OA":
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if ch(i + 1) == "H":
                out.append("0")  # theta
                i += 1
            elif ch(i + 1) == "I" and ch(i + 2) in "OA":
                out.append("X")
            else:
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c == "W":
            if ch(i + 1) in "AEIOU":
                out.append("W")
        elif c == "X":
            out.append("K")
            out.append("S")
        elif c == "Y":
            if ch(i + 1) in "AEIOU":
                out.append("Y")
        elif c == "Z":
            out.append("S")
        i += 1

    return "".join(out[:max_len])


def soundex_batch(names) -> list[str]:
    return [soundex(x) for x in names]


def metaphone_batch(names) -> list[str]:
    return [metaphone(x) for x in names]

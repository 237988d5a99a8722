"""Transliteration — the YivoTransliterator analog.

Reference: ``modules/yiddish/src/main/scala/.../YivoTransliterator.scala
:194-230`` — dictionary lookup + character-table transliteration of
Yiddish script to a Roman form, with the lookup tables loaded once per
process and an optional memo cache (``YivoLexicon.scala:37,63-75``).

Ours is a language-neutral Hebrew-script -> Roman character-table
transliterator: a fixed table applied greedily (digraphs first), with
a per-instance memo cache. Loaded once per actor (the stateful-
dictionary scalar-function pattern, SURVEY.md §2.2).
"""

from __future__ import annotations

# digraphs matched before single characters (longest-first, fixed order)
_DIGRAPHS: list[tuple[str, str]] = [
    ("וו", "v"),   # vov-vov
    ("וי", "oy"),  # vov-yud
    ("יי", "ey"),  # yud-yud
    ("דז", "dz"),
    ("טש", "tsh"),
]

_SINGLES: dict[str, str] = {
    "א": "a",   # alef
    "ב": "b",
    "ג": "g",
    "ד": "d",
    "ה": "h",
    "ו": "u",
    "ז": "z",
    "ח": "kh",
    "ט": "t",
    "י": "i",
    "ך": "kh",  # final khof
    "כ": "k",
    "ל": "l",
    "ם": "m",   # final mem
    "מ": "m",
    "ן": "n",   # final nun
    "נ": "n",
    "ס": "s",
    "ע": "e",   # ayin
    "ף": "f",   # final fey
    "פ": "p",
    "ץ": "ts",  # final tsadik
    "צ": "ts",
    "ק": "k",
    "ר": "r",
    "ש": "sh",
    "ת": "t",
}


# reverse (Roman -> Hebrew-script) table, longest key first — the
# ``detransliterate`` resource analog (reference
# ``YivoTransliterator.scala:464`` loads the reverse phonetic table
# once per process). Where several script letters share one Roman form
# (kh, ts, m, n, t, k) the reverse picks a CANONICAL letter —
# position-dependent for the final forms (word-final kh -> ך, ts -> ץ,
# m -> ם, n -> ן; else כ-like non-finals) — so
# ``detransliterate(transliterate(x))`` is identity on canonical forms
# and a CANONICALIZING PROJECTION otherwise (the reference's "modulo
# precombination" equivalence, YivoTransliteratorTest.scala:35-47).
_REVERSE_MULTI: list[tuple[str, str, str]] = [
    # (roman, non-final script, final script)
    ("tsh", "טש", "טש"),
    ("sh", "ש", "ש"),
    ("kh", "ח", "ך"),
    ("ts", "צ", "ץ"),
    ("dz", "דז", "דז"),
    ("ey", "יי", "יי"),
    ("oy", "וי", "וי"),
]

_REVERSE_SINGLES: dict[str, tuple[str, str]] = {
    "v": ("וו", "וו"),
    "a": ("א", "א"),
    "b": ("ב", "ב"),
    "g": ("ג", "ג"),
    "d": ("ד", "ד"),
    "h": ("ה", "ה"),
    "u": ("ו", "ו"),
    "z": ("ז", "ז"),
    "t": ("ט", "ט"),
    "i": ("י", "י"),
    "k": ("ק", "ק"),
    "l": ("ל", "ל"),
    "m": ("מ", "ם"),
    "n": ("נ", "ן"),
    "s": ("ס", "ס"),
    "e": ("ע", "ע"),
    "p": ("פ", "פ"),
    "f": ("ף", "ף"),
    "r": ("ר", "ר"),
}

_ROMAN_CHARS = frozenset(
    c for k in _REVERSE_SINGLES for c in k
) | frozenset(c for k, _, _ in _REVERSE_MULTI for c in k)


class Transliterator:
    """Greedy table transliterator with a memo cache (per actor)."""

    def __init__(self):
        self.digraphs = list(_DIGRAPHS)
        self.singles = dict(_SINGLES)
        self._memo: dict[str, str] = {}
        self._rev_memo: dict[str, str] = {}

    def transliterate(self, word: str) -> str:
        cached = self._memo.get(word)
        if cached is not None:
            return cached
        out: list[str] = []
        i = 0
        n = len(word)
        while i < n:
            matched = False
            for src, dst in self.digraphs:
                if word.startswith(src, i):
                    out.append(dst)
                    i += len(src)
                    matched = True
                    break
            if matched:
                continue
            ch = word[i]
            out.append(self.singles.get(ch, ch))
            i += 1
        result = "".join(out)
        self._memo[word] = result
        return result

    def has_script(self, word: str) -> bool:
        return any("\u0590" <= c <= "\u05ff" for c in word)

    def _detransliterate_run(self, run: str) -> str:
        """Reverse one maximal Roman-letter run: greedy longest-first
        parse; a token that ends the run takes the FINAL script form."""
        out: list[str] = []
        i, n = 0, len(run)
        while i < n:
            matched = False
            for src, mid, fin in _REVERSE_MULTI:
                if run.startswith(src, i):
                    i += len(src)
                    out.append(fin if i == n else mid)
                    matched = True
                    break
            if matched:
                continue
            ch = run[i]
            i += 1
            mid_fin = _REVERSE_SINGLES.get(ch)
            if mid_fin is None:
                out.append(ch)
            else:
                out.append(mid_fin[1] if i == n else mid_fin[0])
        return "".join(out)

    def detransliterate(self, text: str) -> str:
        """Roman -> Hebrew script, the ``YivoTransliterator.
        detransliterate`` analog (reference :464): greedy longest-first
        reverse-table parse per Roman-letter run, word-final letters
        taking the final script forms; non-Roman characters pass
        through. ``detransliterate(transliterate(x)) == x`` holds
        exactly on canonical-form script (pytest-pinned parallel
        arrays) and is idempotent-canonicalizing on everything else
        (the "modulo precombination" analog, property-tested)."""
        cached = self._rev_memo.get(text)
        if cached is not None:
            return cached
        out: list[str] = []
        i, n = 0, len(text)
        while i < n:
            if text[i] in _ROMAN_CHARS:
                j = i
                while j < n and text[j] in _ROMAN_CHARS:
                    j += 1
                out.append(self._detransliterate_run(text[i:j]))
                i = j
            else:
                out.append(text[i])
                i += 1
        result = "".join(out)
        self._rev_memo[text] = result
        return result

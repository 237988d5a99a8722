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


class Transliterator:
    """Greedy table transliterator with a memo cache (per actor)."""

    def __init__(self):
        self.digraphs = list(_DIGRAPHS)
        self.singles = dict(_SINGLES)
        self._memo: dict[str, str] = {}

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

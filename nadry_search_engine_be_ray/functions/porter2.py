"""Vendored Porter2 (Snowball "English") stemmer, pure Python.

Implemented from the published algorithm description
(snowball.tartarus.org/algorithms/english/stemmer.html), to replicate the
behavior of the Java library used by the reference tokenizer
(``org.tartarus.snowball.ext.englishStemmer``, used at
search-engin/src/main/java/indexer/Tokenizer.java:11,62-68).

No third-party code was copied; this is a from-scratch transcription of the
public algorithm definition.  It is deliberately dependency-free because the
sandbox ships no stemmer package.

Term identity for the whole engine depends on this function: both the Ray
pipeline and the single-process conformance oracle import the same
``stem()``.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")  # lowercase y only; consonant-y is marked 'Y'
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDINGS = frozenset("cdeghkmnrt")

# exceptional forms, applied to the whole word before the steps
_EXCEPTION1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariants
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# words left invariant after step 1a
_EXCEPTION2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

_SPECIAL_R1_PREFIXES = ("gener", "commun", "arsen")

_STEP2_SUFFIXES = (
    # (suffix, replacement, requires_preceding_l) — longest-match list
    ("ization", "ize", False),
    ("ational", "ate", False),
    ("fulness", "ful", False),
    ("ousness", "ous", False),
    ("iveness", "ive", False),
    ("tional", "tion", False),
    ("biliti", "ble", False),
    ("lessli", "less", False),
    ("entli", "ent", False),
    ("ation", "ate", False),
    ("alism", "al", False),
    ("aliti", "al", False),
    ("ousli", "ous", False),
    ("iviti", "ive", False),
    ("fulli", "ful", False),
    ("enci", "ence", False),
    ("anci", "ance", False),
    ("abli", "able", False),
    ("izer", "ize", False),
    ("ator", "ate", False),
    ("alli", "al", False),
    ("bli", "ble", False),
    ("ogi", "og", True),   # only when preceded by 'l'
    ("li", "", None),      # only when preceded by a valid li-ending
)

_STEP3_SUFFIXES = (
    ("ational", "ate", False),
    ("tional", "tion", False),
    ("alize", "al", False),
    ("icate", "ic", False),
    ("iciti", "ic", False),
    ("ative", "", True),   # only when in R2
    ("ical", "ic", False),
    ("ness", "", False),
    ("ful", "", False),
)

_STEP4_SUFFIXES = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
)


def _is_vowel(ch: str) -> bool:
    return ch in _VOWELS


def _mark_consonant_y(word: str) -> str:
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    return "".join(chars)


def _compute_r1(word: str) -> int:
    for pref in _SPECIAL_R1_PREFIXES:
        if word.startswith(pref):
            return len(pref)
    return _region_after_vc(word, 0)


def _region_after_vc(word: str, start: int) -> int:
    """Index after the first non-vowel following a vowel, scanning from start."""
    n = len(word)
    for i in range(start + 1, n):
        if not _is_vowel(word[i]) and _is_vowel(word[i - 1]):
            return i + 1
    return n


def _ends_short_syllable(word: str) -> bool:
    n = len(word)
    if n == 2:
        return _is_vowel(word[0]) and not _is_vowel(word[1])
    if n >= 3:
        return (
            not _is_vowel(word[-3])
            and _is_vowel(word[-2])
            and not _is_vowel(word[-1])
            and word[-1] not in "wxY"
        )
    return False


def _is_short_word(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


def _contains_vowel(s: str) -> bool:
    return any(_is_vowel(c) for c in s)


def stem(word: str) -> str:
    """Porter2 stem of ``word`` (callers lowercase first, as the reference
    tokenizer does before calling the stemmer)."""
    if len(word) <= 2:
        return word

    exc = _EXCEPTION1.get(word)
    if exc is not None:
        return exc

    w = word
    if w.startswith("'"):
        w = w[1:]
    w = _mark_consonant_y(w)

    r1 = _compute_r1(w)
    r2 = _region_after_vc(w, r1) if r1 < len(w) else len(w)

    # --- step 0: longest of '  's  's'
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # --- step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith("us") or w.endswith("ss"):
        pass
    elif w.endswith("s"):
        if _contains_vowel(w[:-2]):
            w = w[:-1]

    if w in _EXCEPTION2:
        return w

    # --- step 1b
    suffix = None
    for suf in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if w.endswith(suf):
            suffix = suf
            break
    if suffix in ("eed", "eedly"):
        if len(w) - len(suffix) >= r1:
            w = w[: -len(suffix)] + "ee"
    elif suffix is not None:
        stem_part = w[: -len(suffix)]
        if _contains_vowel(stem_part):
            w = stem_part
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif w.endswith(_DOUBLES):
                w = w[:-1]
            elif _is_short_word(w, r1):
                w = w + "e"

    # --- step 1c: y/Y -> i when preceded by a non-vowel that isn't the first
    # letter of the word
    if (
        len(w) > 2
        and w[-1] in "yY"
        and not _is_vowel(w[-2])
    ):
        w = w[:-1] + "i"

    # --- step 2 (condition: suffix in R1)
    for suf, repl, cond in _STEP2_SUFFIXES:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if cond is None:  # 'li' rule
                    if len(w) > len(suf) and w[-len(suf) - 1] in _LI_ENDINGS:
                        w = w[: -len(suf)] + repl
                elif cond:  # 'ogi' rule: preceded by l
                    if len(w) > len(suf) and w[-len(suf) - 1] == "l":
                        w = w[: -len(suf)] + repl
                else:
                    w = w[: -len(suf)] + repl
            break

    # --- step 3 (condition: suffix in R1; 'ative' additionally in R2)
    for suf, repl, needs_r2 in _STEP3_SUFFIXES:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if needs_r2:
                    if len(w) - len(suf) >= r2:
                        w = w[: -len(suf)] + repl
                else:
                    w = w[: -len(suf)] + repl
            break

    # --- step 4 (condition: suffix in R2; 'ion' also needs preceding s/t)
    for suf in _STEP4_SUFFIXES:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) > len(suf) and w[-len(suf) - 1] in "st":
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)]
            break

    # --- step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _ends_short_syllable(w[:-1])
        ):
            w = w[:-1]
    elif w.endswith("l"):
        if len(w) - 1 >= r2 and len(w) >= 2 and w[-2] == "l":
            w = w[:-1]

    return w.replace("Y", "y")

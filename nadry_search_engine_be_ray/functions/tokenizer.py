"""Reference-faithful tokenizer (operator M5/M6 in SURVEY.md §2.2).

Replicates search-engin/src/main/java/indexer/Tokenizer.java:30-97 and
indexer/StopWordFilter.java:8-21 exactly:

1. Unicode NFC normalization (Tokenizer.java:35)
2. extract special tokens (email / url / number regexes, Tokenizer.java:18-23)
   as ``email:<match.lower()>`` / ``url:<match.lower()>`` / ``num:<match>``,
   appended AFTER the word tokens (Tokenizer.java:51)
3. replace specials in the text with ``_EMAIL_`` / ``_URL_`` / ``_NUM_``
   placeholders (Tokenizer.java:92-97), in that order
4. lowercase, strip everything outside ``[a-z0-9_\\s]`` to spaces, collapse
   whitespace, split (Tokenizer.java:39-43)
5. keep tokens of length 2..50 (Tokenizer.java:46)
6. drop the 26 stop words, except the ``_email_`` / ``_num_`` placeholders
   which always survive (Tokenizer.java:47) — note ``_url_`` is NOT
   exempted in the reference; it survives only because it isn't a stop word
7. Porter2-stem tokens of length > 3; placeholders skipped
   (Tokenizer.java:55-68)

All regexes use ASCII character classes to match Java's default (non-unicode)
``\\s`` / ``\\d`` semantics.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Iterable

from .porter2 import stem

# Tokenizer.java:18-23 — identical patterns, ASCII semantics
EMAIL_PATTERN = re.compile(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,6}", re.ASCII)
URL_PATTERN = re.compile(r"(?:https?://|www\.)[a-zA-Z0-9.-]+\.[a-zA-Z]{2,6}[^\s]*", re.ASCII)
NUMBER_PATTERN = re.compile(r"\b\d+(?:\.\d+)?\b", re.ASCII)

_NON_TOKEN = re.compile(r"[^a-z0-9\s_]", re.ASCII)
_WS = re.compile(r"\s+", re.ASCII)
# one pass equivalent to strip-non-token -> collapse-ws -> split: tokens are
# exactly the maximal [a-z0-9_] runs of the lowered text
_TOKEN_RUN = re.compile(r"[a-z0-9_]+", re.ASCII)
_DIGIT = re.compile(r"\d", re.ASCII)

# StopWordFilter.java:12-16 — the fixed 26-word set
STOP_WORDS = frozenset(
    (
        "a", "an", "and", "are", "as", "at", "be", "by", "for",
        "from", "has", "he", "in", "is", "it", "its", "of", "on",
        "that", "the", "to", "was", "were", "will", "with", "this",
    )
)

_PLACEHOLDERS = ("_email_", "_num_")


class Tokenizer:
    """Callable, stateless apart from a stem cache (vocabulary is Zipfian, so
    caching stems amortizes the pure-Python Porter2 cost per worker)."""

    def __init__(self) -> None:
        self._stem_cache: dict[str, str] = {}
        # raw token -> final emitted token, or "" when filtered out: fuses
        # the length gate, stop-word check and stemming into ONE dict hit
        # per token in the hot loop (vocabulary is Zipfian, so nearly every
        # lookup is a cache hit)
        self._final_cache: dict[str, str] = {}

    def stem_token(self, token: str) -> str:
        # Tokenizer.java:55-59 — skip stemming for len <= 3 and placeholders
        if len(token) <= 3 or token in _PLACEHOLDERS:
            return token
        cached = self._stem_cache.get(token)
        if cached is None:
            cached = stem(token)
            # bound the cache so pathological vocabularies can't OOM a worker
            if len(self._stem_cache) < 1_000_000:
                self._stem_cache[token] = cached
        return cached

    def _classify(self, token: str) -> str:
        """Final emitted form of a raw token ('' = dropped) — the slow path
        behind _final_cache; semantics identical to the inline chain
        (Tokenizer.java:46-68).  Calls the raw stemmer (not stem_token) so
        each token is cached ONCE, in _final_cache — double-caching across
        two dicts doubled per-worker memory at 1M-doc scale."""
        if not (2 <= len(token) <= 50):
            return ""
        if token not in _PLACEHOLDERS and token in STOP_WORDS:
            return ""
        if len(token) <= 3 or token in _PLACEHOLDERS:
            return token
        return stem(token)

    def tokenize(self, text: str | None) -> list[str]:
        if not text:
            return []

        text = unicodedata.normalize("NFC", text)

        # the reference extracts all specials from the ORIGINAL text
        # (Tokenizer.java:71-90) but replaces placeholders sequentially (92-97).
        # Cheap substring prechecks skip the regex passes when a pattern
        # cannot possibly match (exact preconditions of each regex).
        special_tokens: list[str] = []
        processable = text
        if "@" in text:
            for m in EMAIL_PATTERN.finditer(text):
                special_tokens.append("email:" + m.group().lower())
            processable = EMAIL_PATTERN.sub("_EMAIL_", processable)
        if "http" in text or "www." in text:
            for m in URL_PATTERN.finditer(text):
                special_tokens.append("url:" + m.group().lower())
            processable = URL_PATTERN.sub("_URL_", processable)
        if _DIGIT.search(text):
            for m in NUMBER_PATTERN.finditer(text):
                special_tokens.append("num:" + m.group())
            processable = NUMBER_PATTERN.sub("_NUM_", processable)

        out: list[str] = []
        cache = self._final_cache
        get = cache.get
        append = out.append
        for token in _TOKEN_RUN.findall(processable.lower()):
            f = get(token)
            if f is None:
                f = self._classify(token)
                if len(cache) < 1_000_000:
                    cache[token] = f
            if f:
                append(f)

        out.extend(special_tokens)
        return out


_GLOBAL = Tokenizer()


def tokenize(text: str | None) -> list[str]:
    """Module-level convenience using a process-global cached tokenizer."""
    return _GLOBAL.tokenize(text)


def tokenize_many(texts: Iterable[str | None]) -> list[list[str]]:
    tk = _GLOBAL
    return [tk.tokenize(t) for t in texts]

"""Text-analysis stages for large-scale training-data pipelines.

Beyond the reference's operator set (per the build brief): language-ID
heuristic, quality scoring, token counting, and document fingerprinting —
each a vectorized ``map_batches`` transform over the ``documents`` table
``(doc_id, text, lang, source, n_chars)``.

Where possible the per-doc metrics are defined by simple closed-form rules so
a DuckDB oracle can recompute them exactly (driver correctness gate); the
rolling-hash fingerprint is checked rows-only + unit tests.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_WS = re.compile(r"\s+")
_WORD = re.compile(r"[A-Za-z0-9_]+")
# GPT-2-style pre-tokenizer shape (public BPE regex family), ASCII-simplified
_BPE_ISH = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")

EN_STOPS = frozenset(
    "a an and are as at be by for from has he in is it its of on that the to was were will with this".split()
)
_PUNCT = frozenset(".,;:!?'\"()[]{}-")


def token_count_batch(batch: pa.Table) -> pa.Table:
    """Whitespace, word-regex and BPE-ish token counts per doc."""
    texts = batch["text"].to_pylist()
    ws, words, bpe = [], [], []
    for t in texts:
        t = t or ""
        ws.append(len([x for x in _WS.split(t.strip()) if x]) if t.strip() else 0)
        words.append(len(_WORD.findall(t)))
        bpe.append(len(_BPE_ISH.findall(t)))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_ws_tokens": pa.array(ws, pa.int64()),
            "n_word_tokens": pa.array(words, pa.int64()),
            "n_bpe_tokens": pa.array(bpe, pa.int64()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality signals: length, mean token length, punctuation / digit /
    uppercase / stopword ratios.  All closed-form (SQL-replicable)."""
    texts = batch["text"].to_pylist()
    n_chars, mean_tok, punct_r, digit_r, upper_r, stop_r = [], [], [], [], [], []
    for t in texts:
        t = t or ""
        toks = [x for x in _WS.split(t.strip()) if x] if t.strip() else []
        nt = len(toks)
        n_chars.append(len(t))
        mean_tok.append((sum(len(x) for x in toks) / nt) if nt else 0.0)
        n = len(t)
        punct_r.append((sum(c in _PUNCT for c in t) / n) if n else 0.0)
        digit_r.append((sum(c.isdigit() for c in t) / n) if n else 0.0)
        upper_r.append((sum(c.isupper() for c in t) / n) if n else 0.0)
        stop_r.append(
            (sum(x.lower() in EN_STOPS for x in toks) / nt) if nt else 0.0
        )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars, pa.int64()),
            "mean_token_len": pa.array(mean_tok, pa.float64()),
            "punct_ratio": pa.array(punct_r, pa.float64()),
            "digit_ratio": pa.array(digit_r, pa.float64()),
            "upper_ratio": pa.array(upper_r, pa.float64()),
            "stopword_ratio": pa.array(stop_r, pa.float64()),
        }
    )


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Heuristic language ID: English-stopword hit rate over whitespace
    tokens (a real corpus would use per-language char-n-gram profiles; the
    rule here is deliberately closed-form so the SQL oracle can replicate
    it bit-for-bit)."""
    texts = batch["text"].to_pylist()
    ratios, preds = [], []
    for t in texts:
        toks = [x for x in _WS.split((t or "").strip()) if x]
        nt = len(toks)
        r = (sum(x.lower() in EN_STOPS for x in toks) / nt) if nt else 0.0
        ratios.append(r)
        preds.append("en" if r >= 0.08 else "other")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "en_stop_ratio": pa.array(ratios, pa.float64()),
            "pred_lang": pa.array(preds, pa.string()),
        }
    )


# --- document fingerprinting (rolling hash / winnowing) --------------------

_B = np.uint64(1000003)
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _token_hashes(tokens: list[str]) -> np.ndarray:
    import zlib

    return np.array(
        [zlib.crc32(t.encode()) for t in tokens], dtype=np.uint64
    )


def rolling_fingerprint(text: str, k: int = 5, w: int = 8) -> int:
    """Winnowed Rabin-Karp fingerprint: polynomial rolling hash over token
    k-grams, then XOR of per-window minima (robust doc signature)."""
    tokens = _WORD.findall((text or "").lower())
    if len(tokens) < k:
        h = np.uint64(0)
        for t in _token_hashes(tokens):
            h = (h * _B + t) & _MASK
        return int(h)
    th = _token_hashes(tokens)
    n = len(tokens) - k + 1
    kgram = np.zeros(n, dtype=np.uint64)
    acc = np.uint64(0)
    powk = np.uint64(1)
    for _ in range(k - 1):
        powk = (powk * _B) & _MASK
    for i in range(k):
        acc = (acc * _B + th[i]) & _MASK
    kgram[0] = acc
    for i in range(1, n):
        acc = ((acc - th[i - 1] * powk) * _B + th[i + k - 1]) & _MASK
        kgram[i] = acc
    if n <= w:
        mins = np.array([kgram.min()], dtype=np.uint64)
    else:
        view = np.lib.stride_tricks.sliding_window_view(kgram, w)
        mins = np.unique(view.min(axis=1))
    out = np.uint64(0)
    for m in mins:
        out ^= m
    return int(out)


def fingerprint_sha_batch(batch: pa.Table) -> pa.Table:
    """SQL-reproducible document fingerprint: first 16 hex chars of the md5
    of the lowercased word-token stream joined with single spaces (DuckDB:
    ``substr(md5(array_to_string(regexp_extract_all(lower(text),
    '[a-z0-9_]+'), ' ')), 1, 16)``) — the driver-checkable complement to the
    rolling/winnowed fingerprint below."""
    import hashlib as _hl

    texts = batch["text"].to_pylist()
    fps = [
        _hl.md5(" ".join(_WORD.findall((t or "").lower())).encode()).hexdigest()[:16]
        for t in texts
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fp16": pa.array(fps, pa.string()),
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    fps = [rolling_fingerprint(t) for t in texts]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(np.array(fps, dtype=np.uint64), pa.uint64()),
        }
    )

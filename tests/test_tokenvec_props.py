"""Property tests: the Arrow-vectorized tokenize/n-gram kernels must be
stream-identical to their scalar Python definitions on arbitrary input
(unicode, empty docs, nulls, whitespace runs, long separator runs).

These guard the equivalences the vectorized hot paths rely on:
* ``lm.exploded_tokens``  ==  per-doc ``lm.doc_tokens`` (findall)
* ``lm.bigram_grams`` / ``lm.ngram_strings``  ==  ``" ".join`` windows
* ``textqueries._exploded``  ==  per-doc ``re.split`` simple tokens
* ``heavyhitters.batch_gram_counter``  ==  summed ``simple_grams``
"""

from collections import Counter

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from nadry_search_engine_be_ray.stages.heavyhitters import (
    batch_gram_counter,
    simple_grams,
)
from nadry_search_engine_be_ray.stages.lm import (
    bigram_grams,
    doc_tokens,
    exploded_tokens,
    ngram_strings,
)
from nadry_search_engine_be_ray.pipelines.textqueries import (
    _exploded,
    simple_tokens,
)

texts_st = st.lists(
    st.one_of(
        st.none(),
        st.text(max_size=60),
        st.text(
            alphabet=st.sampled_from(list("ab_ 0\n\t-é{")), max_size=40
        ),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(texts_st)
def test_exploded_tokens_matches_doc_tokens(texts):
    doc_pos, flat, lens = exploded_tokens(pa.array(texts, pa.string()))
    got = [[] for _ in texts]
    for p, t in zip(doc_pos, flat.to_pylist()):
        got[p].append(t)
    exp = [doc_tokens(t) for t in texts]
    assert got == exp
    assert lens.tolist() == [len(e) for e in exp]


@settings(max_examples=200, deadline=None)
@given(texts_st, st.integers(min_value=1, max_value=5))
def test_ngram_strings_matches_join_windows(texts, n):
    doc_pos, flat, _ = exploded_tokens(pa.array(texts, pa.string()))
    grams, starts = ngram_strings(doc_pos, flat, n)
    got = [[] for _ in texts]
    for s, g in zip(starts, grams.to_pylist()):
        got[doc_pos[s]].append(g)
    for t, gs in zip(texts, got):
        toks = doc_tokens(t)
        exp = [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ]
        assert gs == exp


@settings(max_examples=200, deadline=None)
@given(texts_st)
def test_bigram_positions_are_second_token(texts):
    doc_pos, flat, _ = exploded_tokens(pa.array(texts, pa.string()))
    bg, pos = bigram_grams(doc_pos, flat)
    toks = flat.to_pylist()
    for g, p in zip(bg.to_pylist(), pos):
        assert doc_pos[p] == doc_pos[p - 1]
        assert g == f"{toks[p - 1]} {toks[p]}"


@settings(max_examples=200, deadline=None)
@given(texts_st)
def test_textqueries_exploded_matches_re_split(texts):
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    doc_pos, flat, lengths, ok = _exploded(batch)
    raw = [simple_tokens(t) for t in texts]
    got = [[] for _ in texts]
    for p, t in zip(doc_pos, flat.to_pylist()):
        got[p].append(t)
    assert got == raw
    assert lengths.tolist() == [len(r) for r in raw]
    flat_py = [t for r in raw for t in r]
    assert ok.tolist() == [len(t) >= 2 for t in flat_py]


@settings(max_examples=150, deadline=None)
@given(texts_st, st.integers(min_value=1, max_value=4))
def test_batch_gram_counter_matches_simple_grams(texts, n):
    got = batch_gram_counter(pa.array(texts, pa.string()), n)
    exp = Counter()
    for t in texts:
        exp.update(simple_grams(t, n))
    assert got == exp


@settings(max_examples=150, deadline=None)
@given(texts_st)
def test_simhash_column_matches_scalar(texts):
    from nadry_search_engine_be_ray.stages.dedup import (
        SimHashBatch,
        simhash64,
    )

    col = SimHashBatch._simhash_column(pa.array(texts, pa.string()))
    exp = np.array([simhash64(t) for t in texts], dtype=np.uint64)
    assert (col == exp).all()

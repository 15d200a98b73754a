"""Property tests for the curation ops (hypothesis; few examples, each one
spins Dataset jobs)."""

import pyarrow as pa
import ray
from hypothesis import given, settings, strategies as st

from nadry_search_engine_be_ray.stages import curation
from nadry_search_engine_be_ray.stages.textstats import _WORD

WORDS = ["alpha", "beta", "gamma", "delta", "x9", "under_score", "zz"]

doc_texts = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=30).map(" ".join),
    min_size=1,
    max_size=8,
)


def _ds(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


@settings(max_examples=8, deadline=None)
@given(doc_texts, st.integers(2, 7), st.integers(1, 5))
def test_pack_sequences_invariants(ray_session, texts, context, part_docs):
    toks = {i: _WORD.findall(t.lower()) for i, t in enumerate(texts)}
    total = sum(len(v) for v in toks.values())
    out = curation.pack_sequences(
        _ds(texts), context=context, part_docs=part_docs
    ).to_pandas()
    if total == 0:
        # all-empty corpus: zero-row result (schema may be lost through the
        # groupby, the known zero-row-Dataset wart _typed_empty covers)
        assert len(out) == 0
        return
    # (a) full coverage: per-doc segment tokens sum to the doc's token count
    per_doc = out.groupby("doc_id")["n_tokens"].sum().to_dict()
    for i, tv in toks.items():
        assert per_doc.get(i, 0) == len(tv), (i, per_doc, len(tv))
    # (b) every sequence holds exactly `context` tokens except the last
    per_seq = out.groupby("seq_id")["n_tokens"].sum().sort_index()
    if total:
        assert (per_seq.iloc[:-1] == context).all()
        assert per_seq.iloc[-1] == total - context * (len(per_seq) - 1)
    # (c) segments inside a doc are contiguous from 0
    for i, g in out.sort_values(["doc_id", "seq_id"]).groupby("doc_id"):
        starts = list(g["doc_start_tok"])
        sizes = list(g["n_tokens"])
        assert starts[0] == 0
        for a, b, n in zip(starts, starts[1:], sizes):
            assert b == a + n


@settings(max_examples=8, deadline=None)
@given(doc_texts, st.integers(1, 6), st.integers(1, 6))
def test_chunk_windows_reconstruct(ray_session, texts, window, stride):
    out = curation.chunk_windows(
        _ds(texts), window=window, stride=stride
    ).to_pandas()
    if all(not _WORD.findall(t.lower()) for t in texts):
        assert len(out) == 0
        return
    for i, t in enumerate(texts):
        toks = _WORD.findall(t.lower())
        g = out[out.doc_id == i].sort_values("chunk_id")
        if not toks:
            assert len(g) == 0
            continue
        assert list(g.start_tok) == list(range(0, len(toks), stride))
        for _, row in g.iterrows():
            want = toks[row.start_tok : row.start_tok + window]
            assert row.chunk_text.split() == want
            assert row.n_tokens == len(want)
        # stride == window tiles the doc exactly
        if stride == window:
            assert " ".join(x for x in g.chunk_text if x).split() == toks


@settings(max_examples=6, deadline=None)
@given(doc_texts, doc_texts)
def test_decontaminate_consistency(ray_session, bench, train):
    n = 4
    out = curation.decontaminate(
        _ds(train), bench, n=n, concurrency=2
    ).to_pandas()
    bench_grams = curation.benchmark_gram_set(bench, n)
    for i, t in enumerate(train):
        toks = _WORD.findall(t.lower())
        grams = curation.doc_ngrams(toks, n)
        row = out[out.doc_id == i].iloc[0]
        assert row.n_grams == len(grams)
        assert row.n_contaminated == sum(g in bench_grams for g in grams)
        assert bool(row.contaminated) == (row.n_contaminated > 0)

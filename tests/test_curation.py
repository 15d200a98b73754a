"""Curation ops: decontamination, chunking, PII redaction (golden tests;
driver-level SQL conformance lives in test_entry_contract)."""

import pyarrow as pa
import ray

from nadry_search_engine_be_ray.stages import curation


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_decontaminate_flags_overlap(ray_session):
    bench = ["alpha beta gamma delta epsilon zeta eta theta iota kappa"]
    ds = _docs(
        [
            # full copy: every 8-gram hits
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            # clean doc, same vocab but shuffled (no 8-gram match)
            (2, "kappa iota theta eta zeta epsilon delta gamma beta alpha"),
            # embedded overlap: one benchmark 8-gram inside other text
            (3, "x y alpha beta gamma delta epsilon zeta eta theta z"),
            # too short for any 8-gram
            (4, "alpha beta"),
        ]
    )
    out = (
        curation.decontaminate(ds, bench, n=8, concurrency=2)
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "n_grams"] == 3 and out.loc[1, "n_contaminated"] == 3
    assert bool(out.loc[1, "contaminated"])
    assert out.loc[2, "n_contaminated"] == 0 and not bool(out.loc[2, "contaminated"])
    assert out.loc[3, "n_grams"] == 4 and out.loc[3, "n_contaminated"] == 1
    assert out.loc[4, "n_grams"] == 0 and not bool(out.loc[4, "contaminated"])


def test_chunk_windows_shapes(ray_session):
    toks = [f"t{i}" for i in range(40)]
    ds = _docs([(7, " ".join(toks)), (8, ""), (9, "only three tokens")])
    out = (
        curation.chunk_windows(ds, window=32, stride=16)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    d7 = out[out.doc_id == 7]
    assert list(d7.start_tok) == [0, 16, 32]
    assert list(d7.n_tokens) == [32, 24, 8]
    assert d7.iloc[0].chunk_text.split() == toks[:32]
    assert d7.iloc[2].chunk_text.split() == toks[32:]
    assert (out.doc_id == 8).sum() == 0          # empty doc -> no chunks
    d9 = out[out.doc_id == 9]
    assert len(d9) == 1 and d9.iloc[0].n_tokens == 3


def test_repetition_scores_gopher_rules(ray_session):
    ds = _docs(
        [
            # "a b" 2-gram repeats 3/5 of positions; every 5-gram unique?
            # tokens: a b a b a b  -> 2-grams: ab ba ab ba ab (ab x3 / 5)
            #         5-grams: ababa babab (each once) -> dup5 = 0
            (1, "a b a b a b"),
            # fully repeated phrase: all 5-grams occur twice or more
            (2, "x y z w v x y z w v x y z w v"),
            (3, "one two three four five six seven"),
            (4, "solo"),
        ]
    )
    out = (
        curation.repetition_scores(ds).to_pandas().set_index("doc_id")
    )
    assert out.loc[1, "top2gram_frac"] == 0.6 and bool(out.loc[1, "repetitive"])
    assert out.loc[2, "dup5gram_frac"] > 0.3 and bool(out.loc[2, "repetitive"])
    assert not bool(out.loc[3, "repetitive"])
    # single token: no 2-grams at all
    assert out.loc[4, "top2gram_frac"] == 0.0 and not bool(out.loc[4, "repetitive"])


def test_pack_sequences_segment_map(ray_session):
    # docs of 5 / 3 / 4 tokens, context 4: global stream is 12 tokens ->
    # seq 0 = d1[0:4], seq 1 = d1[4:5]+d2[0:3], seq 2 = d3[0:4]
    ds = _docs(
        [
            (1, "a b c d e"),
            (2, "f g h"),
            (3, "i j k l"),
            (4, ""),  # zero-token doc emits nothing
        ]
    )
    out = (
        curation.pack_sequences(ds, context=4, part_docs=2)
        .to_pandas()
        .sort_values(["seq_id", "doc_id"])
        .reset_index(drop=True)
    )
    rows = [tuple(r) for r in out.itertuples(index=False)]
    assert rows == [
        (0, 1, 0, 4),
        (1, 1, 4, 1),
        (1, 2, 0, 3),
        (2, 3, 0, 4),
    ]


def test_redact_pii_counts_and_order(ray_session):
    ds = _docs(
        [
            (1, "mail a@b.com and b.c@d.org plus 555-123-4567 ok"),
            (2, "no pii here"),
            # digits inside an email local part must not double-count as
            # a phone after the email pass removed them
            (3, "x 555-123-4567abc@mail.com y"),
        ]
    )
    out = (
        curation.redact_pii(ds, concurrency=2).to_pandas().set_index("doc_id")
    )
    assert out.loc[1, "n_emails"] == 2 and out.loc[1, "n_phones"] == 1
    assert out.loc[1, "clean_text"] == "mail [EMAIL] and [EMAIL] plus [PHONE] ok"
    assert out.loc[2, "clean_text"] == "no pii here"
    assert out.loc[3, "n_emails"] == 1 and out.loc[3, "n_phones"] == 0
    assert out.loc[3, "clean_text"] == "x [EMAIL] y"


def test_c4_clean_line_rules(ray_session):
    keeper = " ".join(["word"] * 60)          # one long kept line
    ds = _docs(
        [
            # every rule path in one doc: keeper survives, junk dropped
            (1, keeper + "\ntoo short line"
                 + "\nplease enable JavaScript to continue viewing here"
                 + "\ncss block { display none } is ugly markup"
                 + "\nLorem Ipsum dolor sit amet consectetur adipiscing"),
            # doc entirely under min_words -> dropped from output
            (2, "just a handful of small words here"),
            # no newline at all: single kept line
            (3, " ".join(["token"] * 55)),
        ]
    )
    out = curation.c4_clean(ds, min_words=50).to_pandas().set_index("doc_id")
    assert sorted(out.index) == [1, 3]
    assert out.loc[1, "n_lines_kept"] == 1
    assert out.loc[1, "n_lines_dropped"] == 4
    assert out.loc[1, "clean_text"] == keeper
    assert out.loc[3, "n_lines_kept"] == 1 and out.loc[3, "n_lines_dropped"] == 0


def test_paragraph_dedup_keeps_global_first(ray_session):
    ds = _docs(
        [
            (1, "unique one\nshared paragraph text"),
            (2, "shared paragraph text\nunique two"),
            (3, "shared paragraph text"),        # every para a dup -> empty
            (4, "unique four"),
        ]
    )
    out = curation.paragraph_dedup(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "clean_text"] == "unique one\nshared paragraph text"
    assert out.loc[1, "n_dupes_removed"] == 0
    assert out.loc[2, "clean_text"] == "unique two"
    assert out.loc[2, "n_paras_kept"] == 1 and out.loc[2, "n_dupes_removed"] == 1
    assert out.loc[3, "clean_text"] == "" and out.loc[3, "n_paras_kept"] == 0
    assert out.loc[4, "n_paras_kept"] == 1


def test_span_corruption_roundtrip_and_determinism(ray_session):
    """Sentinels in input and target align 1:1 and in order; splicing the
    target's spans back into the input reconstructs the original token
    stream; two runs are identical (pure function of (doc, position))."""
    import re

    import pyarrow as pa
    import ray.data

    from nadry_search_engine_be_ray.stages.curation import span_corruption

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5,
        "one two three",
        "",
        "single",
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    out = span_corruption(ds, p=0.3).to_pandas().sort_values("doc_id")
    out2 = span_corruption(ds, p=0.3).to_pandas().sort_values("doc_id")
    assert out.equals(out2.reset_index(drop=True).set_axis(out.index))

    sent = re.compile(r"<extra_id_(\d+)>")
    for _, row in out.iterrows():
        orig = texts[int(row["doc_id"])].split()
        inp, tgt = row["input_text"].split(), row["target_text"].split()
        # target spans keyed by sentinel
        spans: dict[int, list[str]] = {}
        cur = None
        for tok in tgt:
            m = sent.fullmatch(tok)
            if m:
                cur = int(m.group(1))
                spans[cur] = []
            else:
                assert cur is not None
                spans[cur].append(tok)
        # splice back
        rebuilt: list[str] = []
        seen = []
        for tok in inp:
            m = sent.fullmatch(tok)
            if m:
                k = int(m.group(1))
                seen.append(k)
                rebuilt.extend(spans[k])
            else:
                rebuilt.append(tok)
        assert rebuilt == orig, row["doc_id"]
        assert seen == sorted(spans)  # sentinels in order, all used
        if orig:
            assert all(len(v) >= 1 for v in spans.values())

"""Code-aware analysis operators (pipelines/codequeries.py).

The vectorized Arrow kernels are checked against an INDEPENDENT scalar
Python-``re`` transcription of the declared rules, over both the planted
real-code fixtures and a slice of the synthetic corpus (property-style
cross-validation; the SQL-oracle hash equality is the driver's job).
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from nadry_search_engine_be_ray.pipelines.codequeries import (
    DEF_KEYWORDS,
    PLANTED_CODE,
    augment_with_plants,
    code_def_symbols,
    ident_subtokens,
    import_graph,
)
from nadry_search_engine_be_ray.sources.corpus import make_corpus

_SYM = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")
_MOD = re.compile(r"[A-Za-z_][A-Za-z0-9_.]*\Z")


def _plants_table() -> pa.Table:
    return augment_with_plants(make_corpus(1))


def _scalar_next_token(rows, keywords, rx):
    out = []
    for repo, path, content in rows:
        ts = re.split(r"\s+", content)
        for i in range(len(ts) - 1):
            if ts[i] in keywords and rx.match(ts[i + 1]):
                out.append((repo, path, ts[i], ts[i + 1]))
    return out


def _scalar_subtokens(contents):
    c: Counter = Counter()
    for content in contents:
        for w in re.split(r"\s+", content):
            if len(w) < 2 or not _SYM.match(w):
                continue
            r = re.sub(r"([A-Z]+)([A-Z][a-z])", r"\1 \2", w)
            r = re.sub(r"([a-z0-9])([A-Z])", r"\1 \2", r)
            for sub in re.split(r"[_\s]+", r.lower()):
                if sub:
                    c[sub] += 1
    return c


def _rows(tbl: pa.Table):
    return list(
        zip(
            tbl["repo"].to_pylist(),
            tbl["path"].to_pylist(),
            tbl["content"].to_pylist(),
        )
    )


@pytest.fixture(scope="module")
def corpus_tbl(ray_session) -> pa.Table:
    return augment_with_plants(make_corpus(300))


def test_def_symbols_match_scalar_reference(ray_session, corpus_tbl):
    got = code_def_symbols(ray.data.from_arrow(corpus_tbl))
    exp = Counter(_scalar_next_token(_rows(corpus_tbl), set(DEF_KEYWORDS), _SYM))
    exp_df = (
        pd.DataFrame(
            [(r, p, k, s, n) for (r, p, k, s), n in exp.items()],
            columns=["repo", "path", "kind", "symbol", "n"],
        )
        .astype({"n": "int64"})
        .sort_values(["repo", "path", "kind", "symbol"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp_df)


def test_def_symbols_planted_fixtures(ray_session):
    got = code_def_symbols(ray.data.from_arrow(_plants_table()))
    syms = set(zip(got["kind"], got["symbol"]))
    assert ("def", "start_server") in syms
    assert ("def", "handleRequest") in syms
    assert ("class", "HTTPServer") in syms
    assert ("function", "renderPage") in syms
    assert ("function", "_privateHelper") in syms
    # the symbol regex must reject a leading digit
    assert ("def", "9bad") not in syms
    # duplicate definition sites are counted, not collapsed
    dup = got[(got["kind"] == "def") & (got["symbol"] == "repeated_sym")]
    assert dup["n"].tolist() == [2]


def test_ident_subtokens_match_scalar_reference(ray_session, corpus_tbl):
    got = ident_subtokens(ray.data.from_arrow(corpus_tbl))
    exp = _scalar_subtokens([r[2] for r in _rows(corpus_tbl)])
    exp_df = (
        pd.DataFrame(sorted(exp.items()), columns=["sub", "n"])
        .astype({"n": "int64"})
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp_df)


def test_ident_subtokens_camel_snake_rules(ray_session):
    tbl = pa.table(
        {
            "repo": ["r"],
            "path": ["p"],
            "commit": ["c"],
            "lang": ["python"],
            "content": ["getHTTPServerName_v2 XMLHttpRequest snake_case_name"],
        }
    )
    got = ident_subtokens(ray.data.from_arrow(tbl))
    counts = dict(zip(got["sub"], got["n"]))
    # getHTTPServerName_v2 -> get http server name v2
    # XMLHttpRequest -> xml http request ; snake_case_name -> snake case name
    assert counts == {
        "get": 1, "http": 2, "server": 1, "name": 2, "v2": 1,
        "xml": 1, "request": 1, "snake": 1, "case": 1,
    }


def test_import_graph_match_scalar_reference(ray_session, corpus_tbl):
    got = import_graph(ray.data.from_arrow(corpus_tbl))
    edges = _scalar_next_token(_rows(corpus_tbl), {"import"}, _MOD)
    per_mod_imports: Counter = Counter(m for _, _, _, m in edges)
    per_mod_repos = {
        m: len({r for r, _, _, mm in edges if mm == m})
        for m in per_mod_imports
    }
    exp_df = (
        pd.DataFrame(
            [
                (m, per_mod_repos[m], per_mod_imports[m])
                for m in sorted(per_mod_imports)
            ],
            columns=["module", "n_repos", "n_imports"],
        )
        .astype({"n_repos": "int64", "n_imports": "int64"})
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp_df)


def test_import_graph_planted_fixtures(ray_session):
    got = import_graph(ray.data.from_arrow(_plants_table()))
    by_mod = dict(zip(got["module"], zip(got["n_repos"], got["n_imports"])))
    assert by_mod["os.path"] == (1, 1)
    assert by_mod["java.util.List"] == (1, 1)
    # "import numpy import numpy" in one doc: 2 imports, 1 repo
    assert by_mod["numpy"] == (1, 2)


def test_block_split_invariance(ray_session, corpus_tbl):
    """Output is independent of Dataset block structure (a doc is never
    split mid-content; small override blocks exercise many batches)."""
    ds1 = ray.data.from_arrow(corpus_tbl)
    ds2 = ray.data.from_arrow(corpus_tbl).repartition(13)
    pd.testing.assert_frame_equal(
        code_def_symbols(ds1), code_def_symbols(ds2)
    )
    pd.testing.assert_frame_equal(
        ident_subtokens(ds1), ident_subtokens(ds2)
    )

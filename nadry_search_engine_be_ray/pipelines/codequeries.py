"""Code-aware analysis operators over the source-code corpus.

The graft payload is CODE (`BASELINE.json` `graft_cell.payload`): the input
table is ``(repo, path, commit, lang, content)`` of source files.  These
operators add the code-search analysis layer a user of a source-code search
engine expects on top of the inverted index (reference scope: the Nadry
tokenizer treats code as plain text — `indexer/Tokenizer.java:39-43` — so
this widens, not ports):

* ``code_def_symbols`` — definition-site symbol extraction: a token in
  ``{def, class, function}`` followed by an identifier token defines that
  symbol (the ctags-lite rule).
* ``ident_subtokens``  — camelCase / snake_case identifier splitting into
  subtoken df (the code-search tokenization trick: ``getUserName`` must be
  findable by ``user``).
* ``import_graph``     — ``import <module>`` edge extraction and the
  per-module fan-in aggregate (which modules the corpus depends on).

All three share one vectorized whitespace-token explode (Arrow RE2 kernels,
no Python token loops) and are SQL-checkable: every regex / split /
next-token rule is RE2 semantics that DuckDB's ``regexp_*`` /
``string_split_regex`` reproduce exactly, so the driver hash-compares the
full extraction + aggregation path.  The augmented input (corpus + planted
real-code fixtures) is dumped to a fixed parquet path that the static oracle
SQL reads — the dumped-table trick of ``pipelines/oracle_dump.py``.

Scale: each operator is one ``map_batches`` explode followed by one
``groupby`` on a bounded key space (symbols / subtokens / modules — vocab-
sized, not corpus-sized), the same partial-then-small-combine shape as
``textqueries.term_df``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

# next-token keyword sets (both sides filter with IN over these literals)
DEF_KEYWORDS = ["def", "class", "function"]
IMPORT_KEYWORD = "import"

# RE2 patterns — string-identical on the DuckDB side
SYM_RE = "^[A-Za-z_][A-Za-z0-9_]*$"
MOD_RE = "^[A-Za-z_][A-Za-z0-9_.]*$"
CAMEL_AB_RE = "([A-Z]+)([A-Z][a-z])"   # HTTPServer -> HTT PServer boundary
CAMEL_aB_RE = "([a-z0-9])([A-Z])"       # getUser -> get User boundary
SUB_SPLIT_RE = "[_\\s]+"


def _ws_exploded(batch: pa.Table):
    """Whitespace-split ``content``: (doc_pos, flat, n_tokens_per_doc).

    RAW ``\\s+`` split (leading-empty edge tokens preserved) — verified
    identical to DuckDB ``string_split_regex(content, '\\s+')`` so oracle
    SQL can replay the token stream bit-for-bit.
    """
    texts = batch["content"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    split = pc.split_pattern_regex(pc.fill_null(texts, ""), pattern="\\s+")
    lengths = pc.list_value_length(split).to_numpy().astype(np.int64)
    flat = pc.list_flatten(split)
    doc_pos = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
    return doc_pos, flat, lengths


def _next_token_matches(
    batch: pa.Table, keywords: list[str], next_re: str
) -> tuple[np.ndarray, pa.Array, pa.Array]:
    """Positions where token ∈ keywords and the NEXT token (same doc)
    matches ``next_re``; returns (doc_row, kw_tokens, next_tokens)."""
    doc_pos, flat, _ = _ws_exploded(batch)
    n = len(flat)
    if n == 0:
        e = pa.array([], pa.string())
        return np.empty(0, dtype=np.int64), e, e
    kw = pc.is_in(flat, value_set=pa.array(keywords, pa.string())).to_numpy(
        zero_copy_only=False
    )
    idx = np.flatnonzero(kw)
    nxt = idx + 1
    in_range = nxt < n
    idx, nxt = idx[in_range], nxt[in_range]
    same_doc = doc_pos[nxt] == doc_pos[idx]
    idx, nxt = idx[same_doc], nxt[same_doc]
    ok = pc.match_substring_regex(
        pc.take(flat, pa.array(nxt, pa.int64())), pattern=next_re
    ).to_numpy(zero_copy_only=False)
    idx, nxt = idx[ok], nxt[ok]
    return (
        doc_pos[idx],
        pc.take(flat, pa.array(idx, pa.int64())),
        pc.take(flat, pa.array(nxt, pa.int64())),
    )


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------

def code_def_symbols(src: ray.data.Dataset) -> pd.DataFrame:
    """Definition-site symbols: (repo, path, kind, symbol, n) aggregated
    and fully ordered (deterministic under any block order)."""

    def extract(batch: pa.Table) -> pa.Table:
        rows, kws, syms = _next_token_matches(batch, DEF_KEYWORDS, SYM_RE)
        take = pa.array(rows, pa.int64())
        return pa.table(
            {
                "repo": pc.take(batch["repo"], take),
                "path": pc.take(batch["path"], take),
                "kind": kws,
                "symbol": syms,
            }
        )

    out = (
        src.map_batches(extract, batch_format="pyarrow")
        .groupby(["repo", "path", "kind", "symbol"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["repo", "path", "kind", "symbol"]).reset_index(
        drop=True
    )


def ident_subtokens(src: ray.data.Dataset) -> pd.DataFrame:
    """camelCase / snake_case subtoken df over every identifier token.

    Rule (RE2, order matters): split the ALLCAPS↔Titlecase boundary first
    (``HTTPServer``), then lower↔upper (``getUser``); lowercase; split on
    ``[_\\s]+``; drop empties.  Output: (sub, n) ordered by sub.
    """

    def extract(batch: pa.Table) -> pa.Table:
        _, flat, _ = _ws_exploded(batch)
        is_ident = pc.and_(
            pc.match_substring_regex(flat, pattern=SYM_RE),
            pc.greater_equal(pc.utf8_length(flat), 2),
        )
        idents = flat.filter(is_ident)
        r1 = pc.replace_substring_regex(
            idents, pattern=CAMEL_AB_RE, replacement=r"\1 \2"
        )
        r2 = pc.replace_substring_regex(
            r1, pattern=CAMEL_aB_RE, replacement=r"\1 \2"
        )
        subs = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(r2), pattern=SUB_SPLIT_RE)
        )
        subs = subs.filter(pc.not_equal(subs, ""))
        # batch-local partial count (combiner before the small groupby)
        part = pa.table({"sub": subs}).group_by("sub").aggregate([("sub", "count")])
        return pa.table(
            {"sub": part["sub"], "n_part": part["sub_count"].cast(pa.int64())}
        )

    out = (
        src.map_batches(extract, batch_format="pyarrow")
        .groupby("sub")
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values("sub").reset_index(drop=True)


def import_graph(src: ray.data.Dataset) -> pd.DataFrame:
    """Per-module import fan-in: (module, n_repos, n_imports) ordered by
    module.  n_repos counts DISTINCT importing repos (two-level groupby:
    (module, repo) pair counts first, then the module rollup — both on
    vocab-sized key spaces)."""

    def extract(batch: pa.Table) -> pa.Table:
        rows, _, mods = _next_token_matches(batch, [IMPORT_KEYWORD], MOD_RE)
        take = pa.array(rows, pa.int64())
        return pa.table(
            {"repo": pc.take(batch["repo"], take), "module": mods}
        )

    pairs = (
        src.map_batches(extract, batch_format="pyarrow")
        .groupby(["module", "repo"])
        .aggregate(Count(alias_name="n_imports_repo"))
    )
    out = (
        pairs.groupby("module")
        .aggregate(
            Count(alias_name="n_repos"),
            Sum("n_imports_repo", alias_name="n_imports"),
        )
        .to_pandas()
    )
    out["n_repos"] = out["n_repos"].astype("int64")
    out["n_imports"] = out["n_imports"].astype("int64")
    return out.sort_values("module").reset_index(drop=True)


# ---------------------------------------------------------------------------
# planted fixtures — real code shapes the synthetic corpus lacks
# ---------------------------------------------------------------------------

PLANTED_CODE = [
    (
        "plants/pyapp", "src/server.py", "python",
        "import os.path\nimport collections.abc\n"
        "def start_server x\n"
        "def handleRequest y\n"
        "class HTTPServer base\n"
        "class RequestHandler_v2 base\n"
        "return getUserName userId snake_case_name",
    ),
    (
        "plants/jsapp", "web/app.js", "javascript",
        "import react\nimport lodash.merge\n"
        "function renderPage ctx\n"
        "function fetchJSONData url\n"
        "class AppComponent base\n"
        "const camelCaseVar = parseHTTPResponse innerHTML",
    ),
    (
        "plants/javaapp", "src/Main.java", "java",
        "import java.util.List\nimport java.io.File\n"
        "class MainController impl\n"
        "class XMLHttpRequestFactory impl\n"
        "def 9bad notasymbol\n"          # symbol regex must reject 9bad
        "function _privateHelper ok",
    ),
    (
        "plants/edge", "src/edge.py", "python",
        "import\n"                         # import at end-of-line: next token
        "def\n"                            # is on the next line (same doc —
        "class trailing_kw_at_eof",        # \\s+ spans newlines, both sides)
    ),
    (
        "plants/dup", "src/dup.py", "python",
        "def repeated_sym a def repeated_sym b\n"
        "import numpy import numpy",       # duplicate counting path
    ),
    # --- curation plants (stages/codecuration.py; plants=v2) -------------
    (
        "plants/lic-mit", "LICENSE.py", "python",
        "# Permission is hereby granted, free of charge, to any person\n"
        "import mitlib\ndef mit_entry x",
    ),
    (
        "plants/lic-apache", "src/Ap.java", "java",
        "// Licensed under the Apache License, Version 2.0 see NOTICE\n"
        "class ApacheThing base",
    ),
    (
        "plants/lic-gpl", "web/g.js", "javascript",
        "// part of Foo, under the GNU General Public License v3\n"
        "function gplFn a",
    ),
    (
        # BOTH apache + mit phrases: priority order must pick apache-2.0
        "plants/lic-multi", "src/multi.py", "python",
        "# Licensed under the Apache License, Version 2.0\n"
        "# Permission is hereby granted, free of charge\n"
        "def dual_lic y",
    ),
    (
        # minified: single 500-char line -> max_line_len rejection
        "plants/q-longline", "dist/min.js", "javascript",
        "var " + "x" * 496,
    ),
    (
        # auto-generated marker -> autogen rejection
        "plants/q-autogen", "gen/pb.py", "python",
        "# auto-generated by protoc do not edit\ndef gen_fn y",
    ),
    (
        # punctuation soup -> frac_alnum rejection
        "plants/q-punct", "data/p.md", "markdown",
        "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))\n" * 3,
    ),
    (
        # clean short-line file -> keep
        "plants/q-good", "src/ok.py", "python",
        "import os\ndef ok_fn z\nreturn z",
    ),
    (
        # winnowing clone pair: clone-b differs from clone-a by ONE word —
        # they share most selected fingerprints (>= min_shared)
        "plants/clone-a", "src/a.py", "python",
        "def compute_totals for each order in the ledger apply the "
        "discount rate then accumulate the running balance and write "
        "the audit record to the journal before the commit barrier "
        "releases the next batch of pending transactions downstream",
    ),
    (
        "plants/clone-b", "src/b.py", "python",
        "def compute_totals for each order in the ledger apply the "
        "discount rate then accumulate the running balance and write "
        "the audit record to the logbook before the commit barrier "
        "releases the next batch of pending transactions downstream",
    ),
]


def augment_with_plants(corpus: pa.Table) -> pa.Table:
    """Append the planted code docs to a corpus table.  Plant commits are
    distinct 40-char zero-padded ordinals (curation ops key files by
    commit; corpus commits are sha-hex prefixes, collision-free)."""
    plants = pa.table(
        {
            "repo": pa.array([p[0] for p in PLANTED_CODE], pa.string()),
            "path": pa.array([p[1] for p in PLANTED_CODE], pa.string()),
            "commit": pa.array(
                [f"{i:040d}" for i in range(len(PLANTED_CODE))], pa.string()
            ),
            "lang": pa.array([p[2] for p in PLANTED_CODE], pa.string()),
            "content": pa.array([p[3] for p in PLANTED_CODE], pa.string()),
        }
    )
    return pa.concat_tables([corpus.select(plants.column_names), plants])

"""Golden tests for the SymSpell edit-distance helper and the CDC
merge-upsert resolution semantics (driver-level SQL conformance lives in
test_entry_contract)."""

import pytest

from nadry_search_engine_be_ray.pipelines.textqueries import _lev_le1


@pytest.mark.parametrize(
    "a,b,expect",
    [
        ("table", "tablee", True),    # insertion at end
        ("table", "tablle", True),    # insertion mid-word
        ("table", "fable", True),     # substitution
        ("table", "able", True),      # deletion at front
        ("table", "tale", True),      # deletion mid-word
        ("table", "tables", True),
        ("table", "tabel", False),    # transposition = distance 2
        ("table", "fables", False),   # sub + insert = 2
        ("table", "tab", False),      # two deletions
        ("abcd", "abdc", False),
        ("a", "ab", True),
        ("ab", "ba", False),
    ],
)
def test_lev_le1(a, b, expect):
    assert _lev_le1(a, b) is expect
    assert _lev_le1(b, a) is expect  # symmetric


def test_merge_upsert_semantics(ray_session):
    import __ray_entry__ as entry_mod

    out = entry_mod.queries()["merge_upsert"]("/root/testdata/sf0.001")
    base = __import__("pyarrow.dataset", fromlist=["dataset"]).dataset(
        "/root/testdata/sf0.001/documents.parquet"
    ).to_table(columns=["doc_id", "text"]).sort_by("doc_id")
    ids = base["doc_id"].to_pylist()
    up, dele = ids[:5], ids[5:10]
    got = out.set_index("doc_id")
    # updates rewrote text
    for i in up:
        assert got.loc[i, "text"].startswith("updated ")
    # deletes removed the key
    assert not any(i in got.index for i in dele)
    # inserts present under shifted ids
    for i in up:
        assert got.loc[i + 5_000_000, "text"] == f"inserted doc {i}"
    # untouched rows intact, total = base - 5 + 5
    assert len(got) == base.num_rows


# -- property: _lev_le1 agrees with a reference DP levenshtein ------------
from hypothesis import given, settings
from hypothesis import strategies as st


def _lev_dp(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="abc", min_size=0, max_size=6),
    st.text(alphabet="abc", min_size=0, max_size=6),
)
def test_lev_le1_matches_dp(a, b):
    if a == b:
        return
    assert _lev_le1(a, b) == (_lev_dp(a, b) <= 1)

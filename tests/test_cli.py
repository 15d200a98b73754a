"""CLI entry points: build / search / curate round trip (serve covered by
test_http_server; these call main() in-process, sharing the test session)."""

import json
import os

from nadry_search_engine_be_ray.__main__ import main


def test_cli_build_and_search(ray_session, tiny_corpus_dir, tmp_path, capsys):
    index = os.path.join(tmp_path, "idx")
    assert main(["build", tiny_corpus_dir, index, "--shards", "2",
                 "--salt-bits", "1"]) == 0
    phases = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "segments" in phases

    assert main(["search", index, "import", "--size", "5"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["success"] is True and len(out["data"]) <= 5

    assert main(["search", index, "import", "--mode", "bm25"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["results"]


def test_cli_curate(ray_session, tmp_path, capsys):
    docs = "/root/testdata/sf0.001/documents.parquet"
    out_dir = os.path.join(tmp_path, "curated")
    assert main(["curate", docs, out_dir]) == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["curated"] > 0


def test_cli_ingest_then_build(ray_session, tmp_path, capsys):
    import json as _json

    from nadry_search_engine_be_ray.sources.corpus import make_corpus

    src = os.path.join(tmp_path, "dump.jsonl")
    with open(src, "w") as f:
        for row in make_corpus(48).to_pylist():
            f.write(_json.dumps(row) + "\n")
    canon = os.path.join(tmp_path, "canon")
    assert main(["ingest", src, canon]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["out_dir"] == canon

    index = os.path.join(tmp_path, "idx2")
    assert main(["build", canon, index, "--shards", "2",
                 "--salt-bits", "1"]) == 0
    phases = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "segments" in phases


def test_cli_terms_tooling(ray_session, built_index, capsys):
    assert main(["terms", "suggest", built_index, "se", "--k", "3"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["suggestions"] and all(
        s.startswith("se") for s in out["suggestions"])

    assert main(["terms", "spell", built_index, "serch tokken"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["corrections"]["serch"] == "search"

    assert main(["terms", "wildcard", built_index, "se%ch"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "search" in out["terms"]


def test_cli_delete_purge_upsert(ray_session, tiny_corpus_dir, tmp_path,
                                 capsys):
    """delete -> stale bm25 still serves -> purge shrinks n_docs; upsert
    replaces by (repo, path) with layout config copied from the base."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    index = os.path.join(tmp_path, "idx")
    assert main(["build", tiny_corpus_dir, index, "--shards", "2",
                 "--salt-bits", "1"]) == 0
    capsys.readouterr()

    di = pads.dataset(
        os.path.join(index, "doc_stats"), format="parquet"
    ).to_table(columns=["doc_int"])["doc_int"].to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    victims = [str(int(d)) for d in np.sort(di)[:3]]
    assert main(["delete", index] + victims) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["n_total"] == 3

    assert main(["purge", index]) == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["n_purged"] == 3

    # upsert: replace one doc's content via a delta corpus
    src = pads.dataset(tiny_corpus_dir, format="parquet").to_table()
    one = src.slice(0, 1)
    one = one.set_column(
        one.schema.get_field_index("commit"), "commit",
        pa.array([c[::-1] for c in one["commit"].to_pylist()], pa.string()),
    )
    delta = os.path.join(tmp_path, "delta")
    os.makedirs(delta)
    pq.write_table(one, os.path.join(delta, "p.parquet"))
    out_idx = os.path.join(tmp_path, "up")
    assert main(["upsert", index, delta, out_idx]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["num_shards"] == 2 and stats["n_replaced"] in (0, 1)

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

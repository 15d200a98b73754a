"""CLI entry points (the reference's Main.java / WebCrawlerMain /
SearchApplication runners, as one `python -m nadry_search_engine_be_ray`):

    build   corpus-parquet-dir index-dir [--shards N] [--salt-bits B]
            [--content-mode code|html]
    search  index-dir "query" [--page P] [--size K] [--mode auto|bm25]
    serve   index-dir [--port 3000]
    merge   index-dir [index-dir ...] out-dir
    curate  documents-parquet out-dir
    ingest  src out-dir [--format parquet|jsonl|csv]
    delete  index-dir doc_int [...] [--hex]
    purge   index-dir
    upsert  base-index-dir delta-corpus-dir out-dir

The CLI owns its Ray session (library code never calls ray.init —
the driver contract); `serve` blocks until Ctrl-C like the Spring app.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray():
    import os

    import ray

    if not ray.is_initialized():
        # honor $RAY_ADDRESS so the same CLI attaches to a running
        # multi-node cluster (RAY_ADDRESS=auto / an explicit head address)
        # — ray.init(address="local") would IGNORE the env var and always
        # spin up a private local instance
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_build(args) -> int:
    _ray()
    from .config import BuildConfig
    from .pipelines.build import build_index

    manifest = build_index(
        args.corpus, args.index,
        BuildConfig(num_shards=args.shards, salt_bits=args.salt_bits,
                    content_mode=args.content_mode),
    )
    print(json.dumps({k: v.get("seconds") for k, v in manifest["phases"].items()}))
    return 0


def cmd_search(args) -> int:
    _ray()
    from .pipelines.api import SearchAPI

    api = SearchAPI(args.index)
    if args.mode == "bm25":
        hits = api.engine.bm25_search(args.query, k=args.size)
        out = {"results": [{"doc_int": f"{d:015x}", "score": s} for d, s in hits]}
    else:
        out = api.search(args.query, page=args.page, limit=args.size)
    print(json.dumps(out, default=str))
    return 0


def cmd_serve(args) -> int:
    _ray()
    from .pipelines.http_server import serve

    server = serve(args.index, port=args.port,
                   suggestions_path=args.suggestions)
    print(f"serving on http://127.0.0.1:{server.server_address[1]}", flush=True)
    try:
        import signal

        signal.pause()
    except (KeyboardInterrupt, AttributeError):
        pass
    finally:
        server.shutdown()
    return 0


def cmd_merge(args) -> int:
    _ray()
    from .pipelines.merge import merge_indexes

    stats = merge_indexes(args.indexes, args.out)
    print(json.dumps(stats))
    return 0


def cmd_curate(args) -> int:
    ray = _ray()
    import ray.data

    from .pipelines.training_data import curate_to_parquet

    ds = ray.data.read_parquet(args.documents, columns=["doc_id", "text"])
    metrics = curate_to_parquet(ds, args.out)
    print(json.dumps(metrics))
    return 0


def cmd_terms(args) -> int:
    """Dictionary tooling: autocomplete / spell / wildcard lookups from
    the command line (thin wrappers over the driver-checked operators)."""
    _ray()
    from .pipelines import query as q

    if args.op == "suggest":
        t = q.prefix_suggest(args.index, [args.arg], k=args.k)
        out = {"suggestions": t["term"].to_pylist()}
    elif args.op == "spell":
        t = q.spell_correct(args.index, args.arg.split())
        out = {"corrections": dict(zip(t["query"].to_pylist(),
                                       t["suggestion"].to_pylist()))}
    else:  # wildcard
        t = q.wildcard_terms(args.index, [args.arg])
        out = {"terms": t["term"].to_pylist()}
    print(json.dumps(out))
    return 0


def cmd_ingest(args) -> int:
    _ray()
    from .sources.ingest import ingest_to_parquet

    out = ingest_to_parquet(args.src, args.out, format=args.format)
    print(json.dumps({"out_dir": out}))
    return 0


def cmd_delete(args) -> int:
    """Tombstone documents by doc_int (hex or decimal); O(tombstones)."""
    from .pipelines.deletes import delete_docs

    ids = [int(x, 16) if args.hex else int(x) for x in args.doc_ints]
    print(json.dumps(delete_docs(args.index, ids)))
    return 0


def cmd_purge(args) -> int:
    """Physically rewrite segments dropping tombstoned docs."""
    _ray()
    from .pipelines.deletes import purge_deletes

    print(json.dumps(purge_deletes(args.index)))
    return 0


def cmd_upsert(args) -> int:
    """Replace-by-(repo,path) + add: delta build + tombstone-consuming
    merge (Lucene updateDocument).  The delta build copies the BASE
    index's layout config — merge requires identical shards/salt."""
    import os

    _ray()
    from .config import BuildConfig
    from .pipelines.merge import upsert_index

    with open(os.path.join(args.index, "stats.json")) as f:
        base = json.load(f)
    stats = upsert_index(
        args.index, args.delta, args.out,
        BuildConfig(num_shards=int(base["num_shards"]),
                    salt_bits=int(base["salt_bits"])),
    )
    print(json.dumps(stats))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="nadry_search_engine_be_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("corpus"); b.add_argument("index")
    b.add_argument("--shards", type=int, default=8)
    b.add_argument("--salt-bits", type=int, default=2)
    b.add_argument("--content-mode", choices=["code", "html"], default="code")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search")
    s.add_argument("index"); s.add_argument("query")
    s.add_argument("--page", type=int, default=1)
    s.add_argument("--size", type=int, default=10)
    s.add_argument("--mode", choices=["auto", "bm25"], default="auto")
    s.set_defaults(fn=cmd_search)

    v = sub.add_parser("serve")
    v.add_argument("index")
    v.add_argument("--port", type=int, default=3000)
    v.add_argument("--suggestions", default=None)
    v.set_defaults(fn=cmd_serve)

    m = sub.add_parser("merge")
    m.add_argument("indexes", nargs="+")
    m.add_argument("out")
    m.set_defaults(fn=cmd_merge)

    c = sub.add_parser("curate")
    c.add_argument("documents"); c.add_argument("out")
    c.set_defaults(fn=cmd_curate)

    t = sub.add_parser("terms")
    t.add_argument("op", choices=["suggest", "spell", "wildcard"])
    t.add_argument("index"); t.add_argument("arg")
    t.add_argument("--k", type=int, default=5)
    t.set_defaults(fn=cmd_terms)

    i = sub.add_parser("ingest")
    i.add_argument("src"); i.add_argument("out")
    i.add_argument("--format", choices=["parquet", "jsonl", "csv"],
                   default=None)
    i.set_defaults(fn=cmd_ingest)

    d = sub.add_parser("delete")
    d.add_argument("index")
    d.add_argument("doc_ints", nargs="+")
    d.add_argument("--hex", action="store_true",
                   help="doc_ints are 15-hex doc_id prefixes")
    d.set_defaults(fn=cmd_delete)

    g = sub.add_parser("purge")
    g.add_argument("index")
    g.set_defaults(fn=cmd_purge)

    u = sub.add_parser("upsert")
    u.add_argument("index"); u.add_argument("delta"); u.add_argument("out")
    u.set_defaults(fn=cmd_upsert)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

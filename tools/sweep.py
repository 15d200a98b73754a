"""Full driver-sim correctness sweep (VERDICT r3 #3).

Runs EVERY ``queries()`` entry at sf0.01 side-by-side with its
``oracle_sql()`` in DuckDB and records per-key rows / sorted-column schema
/ canonical value-hash matches in the same shape as the driver's
``CORRECTNESS_r{N}.json`` — the driver samples 50 keys per round, so this
committed artifact is the survival evidence for the keys the sample skips.

Canonicalization before hashing (documented because the driver's exact
recipe is not visible): columns sorted by name, float columns rounded to
6 decimals, datetimes normalized to microseconds, rows sorted by all
columns.  Keys with no oracle entry are recorded rows-only.

Usage: PYTHONPATH=/root/repo python tools/sweep.py [out.json] [sf_dir]
                [--exec-only]

``--exec-only`` skips the DuckDB oracles entirely and only EXECUTES every
Ray query, recording row counts and errors — the crash sweep (VERDICT r4
#3): green-at-sf0.01 does not imply runs-at-sf0.1 (the round-4 textrank
empty-schema-block crash was exactly this class), so each round runs this
at 10x the oracle scale where full oracles would be too slow.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df):
    import pandas as pd

    df = pd.DataFrame(df)
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        if df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


def canon_hash(df, sort_rows: bool = True) -> str:
    """Row-sorted hash compares Ray vs oracle; ``sort_rows=False`` hashes
    the EMITTED row order — diffing it across two sweep runs catches
    tie-order / block-order nondeterminism the sorted hash hides
    (VERDICT r3 #3 audit)."""
    import pandas as pd

    df = _canon(df)
    if sort_rows:
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.sha256(
        pd.util.hash_pandas_object(df, index=False).values.tobytes()
    ).hexdigest()


def main() -> None:
    exec_only = "--exec-only" in sys.argv
    argv = [a for a in sys.argv if a != "--exec-only"]
    out_path = argv[1] if len(argv) > 1 else "CORRECTNESS_full.json"
    sf = argv[2] if len(argv) > 2 else "/root/testdata/sf0.01"

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import duckdb
    import pandas as pd

    import __ray_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )

    results: dict[str, dict] = {}
    t_start = time.time()
    for i, name in enumerate(sorted(qs)):
        t0 = time.time()
        rec: dict = {}
        try:
            r = qs[name](sf)
            if hasattr(r, "to_pandas") and not isinstance(r, pd.DataFrame):
                r = r.to_pandas()
            r = pd.DataFrame(r)
            if exec_only:
                rec = {"exec_only": True, "spark_rows": len(r), "err": None}
            elif name in oracles:
                o = con.execute(oracles[name]).df()
                rec = {
                    "rows_match": len(r) == len(o),
                    "schema_match": sorted(map(str, r.columns))
                    == sorted(map(str, o.columns)),
                    "hash_match": None,
                    "spark_rows": len(r),
                    "oracle_rows": len(o),
                    "err": None,
                }
                if rec["rows_match"] and rec["schema_match"]:
                    rec["hash_match"] = canon_hash(r) == canon_hash(o)
                else:
                    rec["hash_match"] = False
                rec["order_hash"] = canon_hash(r, sort_rows=False)
            else:
                rec = {
                    "rows_only": True,
                    "spark_rows": len(r),
                    "order_hash": canon_hash(r, sort_rows=False),
                    "err": None,
                }
        except Exception as e:  # record, keep sweeping
            rec = {"err": f"{type(e).__name__}: {e}", "hash_match": False}
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        status = (
            "exec-ok" if rec.get("exec_only") and not rec.get("err")
            else "rows-only" if rec.get("rows_only")
            else ("OK" if rec.get("hash_match") else "FAIL")
        )
        print(f"[{i + 1}/{len(qs)}] {name}: {status} ({rec['sec']}s)",
              flush=True)

    n_sql = sum(1 for v in results.values() if "rows_match" in v)
    n_green = sum(1 for v in results.values() if v.get("hash_match"))
    n_rows_only = sum(1 for v in results.values() if v.get("rows_only"))
    n_err = sum(1 for v in results.values() if v.get("err"))
    summary = {
        "total": len(results),
        "exec_only_mode": exec_only,
        "sql_checked": n_sql,
        "sql_green": n_green,
        "rows_only": n_rows_only,
        "errors": n_err,
        "sf_dir": sf,
        "total_sec": round(time.time() - t_start, 1),
    }
    with open(out_path, "w") as f:
        json.dump({"_summary": summary, **results}, f, indent=1)
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()

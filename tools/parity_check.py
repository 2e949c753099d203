#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/parity_check.py <sfdir> <verify_out_dir>

Reads each <verify_out_dir>/<name> parquet (written by graft.Verify),
runs the matching oracle_sql.json entry in DuckDB against the same
parquet tables, and compares: row count, column names, and values
(rows sorted, columns sorted by name). Reports per-query PASS/FAIL.
Driver-side tooling only — not part of the Scala library.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def main() -> int:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    for t in TABLES:
        # generated SF dirs (tools.ScaleUp) hold multi-file tables as
        # <table>.parquet/ directories; driver fixtures are single files
        p = f"{sfdir}/{t}.parquet"
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        marker = f"{outdir}/{name}/_ERROR.json"
        if os.path.exists(marker):
            err = json.load(open(marker)).get("err", "?")
            print(f"FAIL  {name}: query failed in Verify: {err}")
            failures += 1
            continue
        try:
            got = pd.read_parquet(f"{outdir}/{name}")
            want = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        bad = None
        for col in g.columns:
            gv, wv = g[col].tolist(), w[col].tolist()
            for i, (x, y) in enumerate(zip(gv, wv)):
                if not values_equal(x, y):
                    bad = (col, i, x, y)
                    break
            if bad:
                break
        if bad:
            col, i, x, y = bad
            print(f"FAIL  {name}: value mismatch col={col} row={i}: spark={x!r} duck={y!r}")
            failures += 1
        else:
            print(f"PASS  {name} ({len(g)} rows)")
    # rows-only queries (no oracle): report row counts
    import os
    for d in sorted(os.listdir(outdir)):
        if d not in oracle and not d.endswith(".json"):
            try:
                n = len(pd.read_parquet(f"{outdir}/{d}"))
                print(f"ROWS  {d}: {n} rows {'(>0 ok)' if n > 0 else '(EMPTY!)'}")
            except Exception as e:  # noqa: BLE001
                print(f"ROWS  {d}: unreadable: {e}")
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracle queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

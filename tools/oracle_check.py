#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

<verifyOutDir> is what `graft.Verify <sfDir> <out>` wrote: one parquet
directory per query plus oracle_sql.json. For each query we run the oracle
SQL in DuckDB against views over the same testdata parquet, then compare to
the Spark result: columns sorted by name, rows sorted, floats rounded to 6
decimals. Exit 1 on any mismatch.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        return 0.0 if r == 0 else r  # collapse -0.0
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failed = []
    for name, sql in sorted(oracle.items()):
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            print(f"[FAIL] {name}: no spark output dir")
            failed.append(name)
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            g_cols = [d[0] for d in got.description]
            g_rows = got.fetchall()
            want = con.execute(sql)
            w_cols = [d[0] for d in want.description]
            w_rows = want.fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: {e}")
            failed.append(name)
            continue
        gc, gr = norm_rows(g_cols, g_rows)
        wc, wr = norm_rows(w_cols, w_rows)
        if gc != wc:
            print(f"[FAIL] {name}: columns spark={gc} oracle={wc}")
            failed.append(name)
        elif gr != wr:
            n_bad = sum(1 for a, b in zip(gr, wr) if a != b)
            n_bad += abs(len(gr) - len(wr))
            print(f"[FAIL] {name}: rows spark={len(gr)} oracle={len(wr)}, "
                  f"{n_bad} differing")
            for a, b in list(zip(gr, wr))[:200]:
                if a != b:
                    print(f"    spark : {a}\n    oracle: {b}")
                    break
            failed.append(name)
        else:
            print(f"[ OK ] {name}: {len(gr)} rows, {len(gc)} cols")

    missing = [n for n in Path(out_dir).iterdir()
               if n.is_dir() and n.name not in oracle]
    for n in missing:
        print(f"[INFO] {n.name}: rows-only (no oracle declared)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} oracle queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

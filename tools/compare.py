#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify (<out>/<name>/ parquet +
<out>/oracle_sql.json): register each testdata table as a DuckDB view,
run the oracle SQL, and compare against the Spark result — columns
sorted by name, rows sorted by all columns, values compared exactly
(after normalizing decimals to their numeric value).
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import decimal
    import math
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v.hex())
    if isinstance(v, list):
        return ("l", tuple(norm_cell(x) for x in v))
    if isinstance(v, dict):
        return ("d", tuple(sorted((k, norm_cell(x)) for k, x in v.items())))
    return (type(v).__name__, str(v))


def frame(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for tname in TABLES:
        p = Path(sf_dir) / f"{tname}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = out / name
        if not spark_dir.exists():
            print(f"MISS  {name}: no spark output")
            n_fail += 1
            continue
        scols, srows = frame(
            con, f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        try:
            ocols, orows = frame(con, oracle[name])
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL  {name}: columns {scols} != {ocols}")
            n_fail += 1
            continue
        def types_of(sql):
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
            return {r[0]: r[1] for r in rows}
        stypes = types_of(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        otypes = types_of(oracle[name])
        for c in stypes:
            if c in otypes and stypes[c] != otypes[c]:
                print(f"  TYPE  {name}.{c}: spark={stypes[c]} "
                      f"oracle={otypes[c]}")
        if sorted(srows) != sorted(orows):
            sset, oset = set(srows), set(orows)
            print(f"FAIL  {name}: {len(srows)} vs {len(orows)} rows; "
                  f"spark-only={list(sset - oset)[:2]} "
                  f"oracle-only={list(oset - sset)[:2]}")
            n_fail += 1
            continue
        if srows != sorted(srows) and srows[::-1] != sorted(srows):
            # not an error for the set-compare, but note unordered output
            pass
        print(f"OK    {name}: {len(srows)} rows")
        n_pass += 1
    extra = [k for k in oracle if not (out / k).exists()]
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

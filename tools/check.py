#!/usr/bin/env python3
"""Local self-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads every <verifyOutDir>/<name>/ parquet result written by graft.Verify,
runs the matching SQL from oracle_sql.json in DuckDB over the same sfDir
parquet tables, and compares values (columns sorted by name, rows sorted
by all columns, doubles compared exactly after both sides' rounding).

This is builder-side tooling only — NOT part of the shipped library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(round(v, 9))
            rr.append(str(v))
        out.append(tuple(rr))
    return sorted(out), [cols[i] for i in order]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    only = sys.argv[3:] or None
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"MISSING  {name} (no spark output)")
            n_bad += 1
            continue
        tbl = pq.read_table(str(res_dir))
        spark_cols = tbl.column_names
        spark_rows = [tuple(d.values()) for d in tbl.to_pylist()]
        try:
            cur = con.execute(oracle[name])
            duck_cols = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
        except Exception as e:
            print(f"SQLERR   {name}: {e}")
            n_bad += 1
            continue
        # schema-type audit (int32 vs int64 etc. would fail the driver)
        norm = {'int64': 'BIGINT', 'int32': 'INTEGER', 'double': 'DOUBLE',
                'float': 'FLOAT', 'string': 'VARCHAR', 'large_string': 'VARCHAR',
                'bool': 'BOOLEAN', 'date32[day]': 'DATE'}
        spark_types = dict(zip(tbl.column_names, [str(t) for t in tbl.schema.types]))
        rel = con.sql(oracle[name])
        duck_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
        type_errs = []
        for c, t in spark_types.items():
            st = norm.get(t, t)
            dt = duck_types.get(c, 'MISSING')
            if st != dt and not (st.startswith('timestamp') and dt.startswith('TIMESTAMP')) \
               and not (t.startswith('list') and dt.endswith(']')):
                type_errs.append(f'{c}: spark={t} duck={dt}')
        if type_errs:
            print(f"TYPES    {name}: {'; '.join(type_errs)}")
            n_bad += 1
            continue
        s_rows, s_cols = canon(spark_rows, spark_cols)
        d_rows, d_cols = canon(duck_rows, duck_cols)
        if s_cols != d_cols:
            print(f"COLS     {name}: spark={s_cols} duck={d_cols}")
            n_bad += 1
        elif s_rows != d_rows:
            n_bad += 1
            print(f"ROWS     {name}: spark={len(s_rows)} duck={len(d_rows)}")
            diff = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
            for a, b in diff[:3]:
                print(f"  spark: {a}\n  duck : {b}")
            if len(s_rows) != len(d_rows):
                sset, dset = set(s_rows), set(d_rows)
                for r in list(sset - dset)[:3]:
                    print(f"  only-spark: {r}")
                for r in list(dset - sset)[:3]:
                    print(f"  only-duck : {r}")
        else:
            n_ok += 1
            print(f"OK       {name} ({len(s_rows)} rows)")
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

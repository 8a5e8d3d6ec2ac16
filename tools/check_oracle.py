#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each query parquet in <verifyOutDir>, if oracle_sql.json has SQL for it,
run the SQL in DuckDB over the sf tables and compare: columns (sorted by
name), row count, and values (rows sorted, floats rounded to 9dp).
"""
import json, sys, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in idx) for r in rows]
    out.sort()
    return [c.lower() for c in sorted(cols)], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import os
    queries = sorted(d for d in os.listdir(out_dir) if d.startswith("q_"))
    n_ok = n_bad = n_skip = 0
    for q in queries:
        spark_rel = con.execute(f"SELECT * FROM '{out_dir}/{q}/*.parquet'")
        scols = [d[0] for d in spark_rel.description]
        srows = spark_rel.fetchall()
        if q not in oracle:
            print(f"SKIP  {q:28s} rows={len(srows)} (no oracle; rows-only check)")
            n_skip += 1
            if len(srows) == 0:
                print(f"  !! EMPTY result for rows-only query")
            continue
        try:
            duck_rel = con.execute(oracle[q])
            dcols = [d[0] for d in duck_rel.description]
            drows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL  {q:28s} oracle SQL error: {str(e)[:120]}")
            n_bad += 1
            continue
        sc, sr = canon_rows(scols, srows)
        dc, dr = canon_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL  {q:28s} columns {sc} vs {dc}")
            n_bad += 1
        elif len(sr) != len(dr):
            print(f"FAIL  {q:28s} rows {len(sr)} vs {len(dr)}")
            n_bad += 1
        elif sr != dr:
            diffs = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
            print(f"FAIL  {q:28s} {len(diffs)} differing rows; first: \n  spark={sr[diffs[0]]}\n  duck ={dr[diffs[0]]}")
            n_bad += 1
        elif len(sr) == 0:
            # both sides empty: the equality is vacuous — treat as failure so
            # a fixture/threshold change cannot silently defang an oracle
            print(f"FAIL  {q:28s} VACUOUS: oracled query matches on zero rows")
            n_bad += 1
        else:
            print(f"OK    {q:28s} rows={len(sr)}")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail, {n_skip} rows-only")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

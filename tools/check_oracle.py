#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against views named after the
tables in <sfDir>, and compares: column names (sorted), row count, and values
(rows sorted by all columns). Exact compare; floats must match bit-for-bit
after the query's own rounding.

Local dev tool only — not part of the shipped Scala library.
"""
import json, math, sys, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return repr(v)

def frame(con, sql):
    cur = con.execute(sql)
    cols = [c[0] for c in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    data = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return cols_sorted, data

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            scols, sdata = frame(con, f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
            ocols, odata = frame(con, sql)
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}"); n_fail += 1; continue
        if len(sdata) != len(odata):
            print(f"FAIL {name}: rows spark={len(sdata)} oracle={len(odata)}"); n_fail += 1; continue
        if sdata != odata:
            bad = next(i for i, (a, b) in enumerate(zip(sdata, odata)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted-row {bad}:\n  spark : {sdata[bad][:400]}\n  oracle: {odata[bad][:400]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(sdata)} rows)"); n_pass += 1
    # queries without oracle → rows-only
    for name in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{name}") and name not in oracle:
            n = con.execute(f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
            print(f"INFO {name}: no oracle, rows={n}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

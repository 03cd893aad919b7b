#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
run graft.Verify first, then this script diffs each <out>/<name> parquet
against DuckDB executing oracle_sql.json on the same sf dir.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json, math, os, sys
import duckdb

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return v

def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(norm(r[i]) for i in order) for r in rel.fetchall()]
    return [cols[i] for i in order], sorted(data, key=repr)

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            duck_cols, duck_rows = rows_of(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            spark_cols, spark_rows = rows_of(
                con.sql(f"SELECT * FROM read_parquet('{spark_path}/*.parquet')"))
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            n_bad += 1
            continue
        if duck_cols != spark_cols:
            print(f"FAIL {name}: columns differ spark={spark_cols} duck={duck_cols}")
            n_bad += 1
            continue
        if duck_rows == spark_rows:
            print(f"ok   {name} ({len(duck_rows)} rows)")
            n_ok += 1
        else:
            print(f"FAIL {name}: {len(spark_rows)} spark rows vs {len(duck_rows)} duck rows")
            for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
                if a != b:
                    print(f"  first diff at sorted row {i}:\n    spark={a}\n    duck ={b}")
                    break
            else:
                k = min(len(spark_rows), len(duck_rows))
                print(f"  extra rows from row {k}:",
                      spark_rows[k:k+2] if len(spark_rows) > k else duck_rows[k:k+2])
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))

#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
run graft.Verify first, then this script diffs each <out>/<name> parquet
against DuckDB executing oracle_sql.json on the same sf dir.

Two checks per query, mirroring the driver's two-level gate:
  1. value match — floats normalized to %.10g (catches wrong results);
  2. repr-exact match — raw python object reprs, Spark side read via
     pyarrow (NOT via DuckDB, which would re-normalize representations).
     This catches representation-level divergence the driver's byte hash
     sees: DECIMAL scale/object-type mismatches, float-vs-decimal columns,
     one-ulp double differences. Round 6 shipped 13 queries that were
     locally green under check 1 alone and hash-failed in the driver —
     a local "ok" now requires BOTH.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [q1,q2,...]
"""
import datetime, glob, json, math, os, sys
import duckdb
import pyarrow.parquet as pq


def canon(v):
    """Canonicalize representation differences that are harness artifacts,
    NOT driver failure modes: pyarrow hands back pandas Timestamps (ns)
    where DuckDB hands back datetime (us) — equal values, different reprs.
    Decimals are deliberately left as-is: their scale/type repr is exactly
    the divergence the repr-exact check exists to catch."""
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if hasattr(v, "isoformat"):          # pd.Timestamp, datetime.date
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return v


def norm(v):
    v = canon(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return v


def sort_rows(cols, raw_rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    exact = sorted((tuple(canon(r[i]) for i in order) for r in raw_rows),
                   key=repr)
    vals = sorted((tuple(norm(r[i]) for i in order) for r in raw_rows),
                  key=repr)
    return [cols[i] for i in order], vals, exact


def duck_rows(rel):
    return sort_rows(rel.columns, rel.fetchall())


def spark_rows(path):
    """Read Spark's parquet output with pyarrow, like the driver does —
    decimals stay decimal.Decimal with the parquet scale, floats stay
    float. Reading through DuckDB instead would hide exactly the
    representation differences this harness exists to catch."""
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    tbl = pq.read_table(files)
    cols = tbl.column_names
    return sort_rows(cols, [tuple(d[c] for c in cols) for d in tbl.to_pylist()])


def first_diff(a, b, label):
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            print(f"  first {label} diff at sorted row {i}:"
                  f"\n    spark={x!r}\n    duck ={y!r}")
            return
    k = min(len(a), len(b))
    print(f"  extra rows from row {k}:", a[k:k + 2] if len(a) > k else b[k:k + 2])


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_repr = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            d_cols, d_vals, d_exact = duck_rows(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            s_cols, s_vals, s_exact = spark_rows(spark_path)
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            n_bad += 1
            continue
        if d_cols != s_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} duck={d_cols}")
            n_bad += 1
        elif s_vals != d_vals:
            print(f"FAIL {name}: {len(s_vals)} spark rows vs {len(d_vals)} duck rows")
            first_diff(s_vals, d_vals, "value")
            n_bad += 1
        elif s_exact != d_exact:
            print(f"REPR {name}: values match but representations differ "
                  f"(driver hash WILL fail)")
            first_diff(s_exact, d_exact, "repr")
            n_repr += 1
        else:
            print(f"ok   {name} ({len(d_vals)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_repr} repr-only, {n_bad} fail")
    return 1 if (n_bad or n_repr) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))

#!/usr/bin/env python3
"""Dev-loop mimic of the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares
each <outDir>/<name> parquet against the DuckDB oracle in oracle_sql.json.

Usage: python3 scripts/oracle_check.py /root/testdata/sf0.01 /tmp/graft_verify
"""
import json, sys, glob, math
import duckdb

def canon(v):
    if isinstance(v, float):
        return ("f", repr(v))
    return (type(v).__name__, str(v))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            spark_cols = sorted(spark_rel.columns)
            spark_proj = con.sql(
                f"SELECT {', '.join(chr(34)+c+chr(34) for c in spark_cols)} FROM spark_rel")
            spark_types = [str(t) for t in spark_proj.types]
            spark_rows = spark_proj.fetchall()
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            duck_proj = con.sql(
                f"SELECT {', '.join(chr(34)+c+chr(34) for c in duck_cols)} FROM duck_rel")
            duck_types = [str(t) for t in duck_proj.types]
            duck_rows = duck_proj.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: cols spark={spark_cols} duck={duck_cols}"); n_fail += 1; continue
        # The driver's hash is TYPE-sensitive at the 64-bit boundary
        # (round-1 ground truth: INTEGER-vs-BIGINT pairs all hash-matched,
        # but every oracle with a bare SUM(<integer>) — HUGEINT, int128 —
        # hash-failed even with identical values). Normalize int widths
        # up to 64-bit into one family; anything wider/other must match.
        def family(t):
            return "int64" if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                                    "UTINYINT", "USMALLINT", "UINTEGER") else t
        if [family(t) for t in spark_types] != [family(t) for t in duck_types]:
            diffs = [f"{c}: spark={a} duck={b}" for c, a, b
                     in zip(spark_cols, spark_types, duck_types)
                     if family(a) != family(b)]
            print(f"FAIL {name}: column TYPES differ — {'; '.join(diffs)}"); n_fail += 1; continue
        a = [tuple(canon(v) for v in r) for r in spark_rows]
        b = [tuple(canon(v) for v in r) for r in duck_rows]
        if a == b:
            print(f"OK   {name} ({len(a)} rows)"); n_ok += 1
        elif sorted(a) == sorted(b):
            print(f"WARN {name}: values match but ROW ORDER differs ({len(a)} rows)"); n_fail += 1
        else:
            sa, sb = set(a), set(b)
            print(f"FAIL {name}: {len(a)} vs {len(b)} rows; "
                  f"spark-only={list(sa-sb)[:2]} duck-only={list(sb-sa)[:2]}")
            n_fail += 1
    print(f"== {n_ok} ok, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Loads each Spark-written parquet under the verify outDir, runs the
matching oracle SQL from oracle_sql.json in DuckDB (tables = the sf dir's
parquet files), sorts columns by name, and compares row-by-row.
Dev tool only — not part of the shipped library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = [tuple(norm(v) for v in r) for r in
                          con.sql(f"SELECT {', '.join(spark_cols)} FROM spark_rel").fetchall()]
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            # Driver-grade type check: the driver hashes typed values, so a
            # DuckDB HUGEINT (e.g. from uncast sum()) mismatches a Spark
            # BIGINT even when every value agrees. Require column-by-column
            # type parity between the Spark parquet and the oracle result so
            # oracle type drift never reaches the driver.
            spark_types = {c: str(t) for c, t in zip(spark_rel.columns, spark_rel.types)}
            duck_types = {c: str(t) for c, t in zip(duck_rel.columns, duck_rel.types)}
            bad_types = [(c, spark_types.get(c), duck_types[c]) for c in duck_types
                         if c in spark_types and spark_types[c] != duck_types[c]]
            if bad_types:
                print(f"FAIL {name}: type drift (col, spark, oracle): {bad_types}")
                failures += 1
                continue
            duck_rows = [tuple(norm(v) for v in r) for r in
                         con.sql(f"SELECT {', '.join(duck_cols)} FROM duck_rel").fetchall()]
            if spark_cols != duck_cols:
                print(f"FAIL {name}: columns {spark_cols} != {duck_cols}")
                failures += 1
                continue
            if len(spark_rows) != len(duck_rows):
                print(f"FAIL {name}: rowcount {len(spark_rows)} != {len(duck_rows)}")
                failures += 1
                continue
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(spark_rows, duck_rows)) if a != b]
            if bad:
                i, a, b = bad[0]
                print(f"FAIL {name}: {len(bad)} row diffs; first at {i}:\n  spark={a}\n  duck ={b}")
                failures += 1
            else:
                print(f"OK   {name} ({len(spark_rows)} rows)")
        except Exception as e:
            print(f"ERROR {name}: {str(e)[:300]}")
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    sys.exit(main(out, sf))

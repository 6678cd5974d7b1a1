#!/usr/bin/env python3
"""sf0.1 depth compare with per-oracle timeouts.

Same contract as compare.py (Spark verify outDir vs DuckDB oracles over
the sf dir's parquet tables), but each oracle runs in a subprocess with a
wall-clock timeout so a quadratic formulation can't hang the whole sweep.
Prints OK/FAIL/TIMEOUT per query plus elapsed seconds. Dev tool only.

Optional 4th arg: a hex digit mirroring GRAFT_DEPTH_SAMPLE — the Spark
verify dump must have been produced with that env set. The documents and
embeddings views get the identical md5-prefix row filter, so the
quadratic pair-generating oracles become feasible at sf0.1 with both
engines seeing exactly the same (subsampled) input rows.

    GRAFT_DEPTH_SAMPLE=0 SPARK_GRAFT_ONLY=q31,... java ... graft.Verify /tmp/vs /root/testdata/sf0.1
    python3 tools/depth_compare.py /tmp/vs /root/testdata/sf0.1 300 0
"""
import json
import math
import multiprocessing as mp
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SAMPLE_KEYS = {"documents": "doc_id", "embeddings": "vec_id"}


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def run_one(name, sql, outdir, sfdir, sample, q):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        pred = ""
        if sample is not None and t in SAMPLE_KEYS:
            pred = (f" WHERE substr(md5(CAST({SAMPLE_KEYS[t]} AS VARCHAR)), 1, 1)"
                    f" <= '{sample}'")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'{pred}")
    try:
        spark_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        spark_cols = sorted(spark_rel.columns)
        spark_rows = sorted((tuple(norm(v) for v in r) for r in
                             con.sql(f"SELECT {', '.join(spark_cols)} FROM spark_rel").fetchall()),
                            key=repr)
        duck_rel = con.sql(sql)
        duck_cols = sorted(duck_rel.columns)
        duck_rows = sorted((tuple(norm(v) for v in r) for r in
                            con.sql(f"SELECT {', '.join(duck_cols)} FROM duck_rel").fetchall()),
                           key=repr)
        if spark_cols != duck_cols:
            q.put(("FAIL", f"columns {spark_cols} != {duck_cols}"))
        elif len(spark_rows) != len(duck_rows):
            q.put(("FAIL", f"rowcount {len(spark_rows)} != {len(duck_rows)}"))
        else:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(spark_rows, duck_rows)) if a != b]
            if bad:
                i, a, b = bad[0]
                q.put(("FAIL", f"{len(bad)} row diffs; first at {i}: spark={a} duck={b}"))
            else:
                q.put(("OK", f"{len(spark_rows)} rows"))
    except Exception as e:
        q.put(("ERROR", str(e)[:300]))


def main(outdir, sfdir, timeout, sample=None):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    counts = {"OK": 0, "FAIL": 0, "ERROR": 0, "TIMEOUT": 0}
    for name, sql in sorted(oracle.items()):
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(name, sql, outdir, sfdir, sample, q))
        t0 = time.time()
        p.start()
        p.join(timeout)
        dt = time.time() - t0
        if p.is_alive():
            p.terminate()
            p.join()
            status, detail = "TIMEOUT", f">{timeout}s"
        else:
            status, detail = q.get() if not q.empty() else ("ERROR", "no result")
        counts[status] += 1
        print(f"{status:7s} {name} ({dt:.1f}s) {detail if status != 'OK' else detail}",
              flush=True)
    print(f"\n{counts['OK']}/{len(oracle)} match; "
          f"{counts['TIMEOUT']} timeout, {counts['FAIL']} fail, {counts['ERROR']} error")
    return 0 if counts["OK"] == len(oracle) else 1


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout01"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    tmo = int(sys.argv[3]) if len(sys.argv) > 3 else 120
    smp = sys.argv[4] if len(sys.argv) > 4 else None
    sys.exit(main(out, sf, tmo, smp))

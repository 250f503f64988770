#!/usr/bin/env python3
"""Per-query DuckDB oracle timings on one SF dir (the other half of the
paired per-query table in SCALE.md — graft warm vs DuckDB warm, same
data, same box). Two passes per query, best-of kept (the Bench
warm-pass convention); threads=32 like the driver's oracle batch.

Usage: python3 tools/duckdb_times.py <sf_dir> <verify_out_dir> [out.json]
  <verify_out_dir> must contain oracle_sql.json (graft.Verify dumps it).
"""
import json
import os
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, out_dir, out_path=None):
    con = duckdb.connect()
    con.sql("SET threads=32")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name in sorted(oracle):
        best = None
        for _ in range(2):
            t0 = time.time()
            try:
                con.sql(oracle[name]).fetchall()
            except Exception as e:  # noqa: BLE001 — record, don't die
                times[name] = f"ERR {e}"
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        else:
            times[name] = round(best, 3)
    total = sum(v for v in times.values() if isinstance(v, float))
    rec = {"sf": sf_dir, "threads": 32, "total_best_sum": round(total, 3),
           "n": len(times), "queries": times}
    line = json.dumps(rec)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main(*sys.argv[1:])

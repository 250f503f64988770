#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run DuckDB oracle SQL
against the same testdata tables and compare with the Spark results dumped
by graft.Verify (sorted columns-by-name, float-rounded, sorted rows)."""
import glob
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if hasattr(v, "isoformat"):
                v = v.isoformat()
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    # queries.json (when Verify is new enough to write it) lists every
    # ATTEMPTED query: one that failed writes no output dir, and without
    # this check the gate silently shrinks instead of failing.
    qpath = f"{out_dir}/queries.json"
    if os.path.exists(qpath):
        dumped = {d.rstrip("/").split("/")[-1] for d in glob.glob(f"{out_dir}/*/")}
        for name in json.load(open(qpath)):
            if name not in dumped:
                results[name] = "MISSING_OUTPUT (query failed in Verify — see its stderr)"
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        tbl = pq.read_table(files[0])
        s_names = tbl.column_names
        s_rows = [tuple(r[c] for c in s_names) for r in tbl.to_pylist()]
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(s_rows)})"
            continue
        try:
            rel = con.sql(oracle[name])
            d_names = rel.columns
            d_rows = rel.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        # The driver's comparator goes through pandas, where DuckDB HUGEINT
        # (int128, from sum()/count_if over integers) widens to float64 while
        # Spark emits int64 — equal values then hash-mismatch. Flag any oracle
        # column with a dtype pandas can't map onto the Spark parquet dtype.
        risky = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t).upper().split("(")[0] in ("HUGEINT", "UHUGEINT", "UBIGINT", "DECIMAL")
        ]
        if risky:
            results[name] = f"DTYPE_RISK {risky} — CAST to BIGINT/DOUBLE in oracle SQL"
            continue
        if sorted(s_names) != sorted(d_names):
            results[name] = f"SCHEMA_MISMATCH spark={sorted(s_names)} duck={sorted(d_names)}"
            continue
        cs = canon(s_rows, list(s_names))
        cd = canon(d_rows, list(d_names))
        if len(cs) != len(cd):
            results[name] = f"ROWCOUNT spark={len(cs)} duck={len(cd)}"
        elif cs != cd:
            bad = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
            results[name] = f"VALUE_MISMATCH ({sum(1 for a, b in zip(cs, cd) if a != b)}/{len(cs)} rows) e.g. {bad[0]}"
        else:
            results[name] = f"OK ({len(cs)} rows)"
    npass = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("ROWS_ONLY"))
    for k in sorted(results):
        flag = "PASS" if results[k].startswith(("OK", "ROWS_ONLY")) else "FAIL"
        print(f"{flag:4} {k:28} {results[k]}")
    print(f"\n{npass}/{len(results)} pass")
    return 0 if npass == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Round-start testdata drift detector.

The driver regenerates /root/testdata between (and sometimes DURING)
rounds, and schema drift arrives silently: in round 10 events.ts
changed parquet era (TIMESTAMP(NANOS) -> TIMESTAMP(MICROS, NTZ)) and
two queries failed analysis mid-round. The shrink-proof Verify gate
catches the FAILURES; this tool catches the DRIFT before any query
runs, by diffing a per-table manifest (physical + logical parquet
schema, row count) against the previous round's committed copy.

Usage:
    python3 tools/schema_sweep.py                 # sweep default SF dirs, diff vs manifest
    python3 tools/schema_sweep.py --update        # ...and rewrite the manifest
    python3 tools/schema_sweep.py /root/testdata/sf0.01   # specific dirs

Exit code 0 = no drift, 1 = drift (diffs printed loudly). Run at round
start; on drift, read the diff, fix/readjust queries, then --update and
commit the new manifest with the fix.
"""
import json
import os
import sys

import pyarrow.parquet as pq

DEFAULT_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
MANIFEST = os.path.join(os.path.dirname(__file__), "testdata_manifest.json")


def sweep(dirs):
    out = {}
    for d in dirs:
        if not os.path.isdir(d):
            out[d] = {"error": "missing directory"}
            continue
        tables = {}
        for name in sorted(os.listdir(d)):
            if not name.endswith(".parquet"):
                continue
            path = os.path.join(d, name)
            f = pq.ParquetFile(path)
            arrow_schema = f.schema_arrow
            tables[name] = {
                "rows": f.metadata.num_rows,
                # logical (arrow) schema: what a reader surfaces
                "columns": {
                    fld.name: str(fld.type) for fld in arrow_schema
                },
                # physical parquet schema line per column: catches
                # era changes (TIMESTAMP(NANOS) vs MICROS) that the
                # arrow view can mask or fail on
                "physical": str(f.schema).strip().splitlines()[1:],
            }
        out[d] = tables
    return out


def diff(prev, cur):
    msgs = []
    for d in sorted(set(prev) | set(cur)):
        if d not in prev:
            msgs.append(f"NEW DIR {d}")
            continue
        if d not in cur:
            msgs.append(f"GONE DIR {d}")
            continue
        p, c = prev[d], cur[d]
        for t in sorted(set(p) | set(c)):
            if t not in p:
                msgs.append(f"NEW TABLE {d}/{t}")
                continue
            if t not in c:
                msgs.append(f"GONE TABLE {d}/{t}")
                continue
            if p[t].get("rows") != c[t].get("rows"):
                msgs.append(
                    f"ROWCOUNT {d}/{t}: {p[t].get('rows')} -> {c[t].get('rows')}")
            pc, cc = p[t].get("columns", {}), c[t].get("columns", {})
            for col in sorted(set(pc) | set(cc)):
                if col not in pc:
                    msgs.append(f"NEW COLUMN {d}/{t}.{col}: {cc[col]}")
                elif col not in cc:
                    msgs.append(f"GONE COLUMN {d}/{t}.{col}: was {pc[col]}")
                elif pc[col] != cc[col]:
                    msgs.append(
                        f"TYPE CHANGE {d}/{t}.{col}: {pc[col]} -> {cc[col]}")
            if p[t].get("physical") != c[t].get("physical"):
                # only note when the logical view did NOT already flag it
                if pc == cc:
                    msgs.append(
                        f"PHYSICAL-ONLY CHANGE {d}/{t} (same logical schema — "
                        "check parquet era, e.g. timestamp unit)")
    return msgs


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    update = "--update" in sys.argv[1:]
    dirs = args or DEFAULT_DIRS
    cur = sweep(dirs)
    if os.path.exists(MANIFEST):
        with open(MANIFEST) as fh:
            prev = json.load(fh)
        msgs = diff(prev, cur)
        if msgs:
            print("=" * 64)
            print("TESTDATA DRIFT DETECTED (vs committed manifest):")
            for m in msgs:
                print("  " + m)
            print("=" * 64)
            if update:
                with open(MANIFEST, "w") as fh:
                    json.dump(cur, fh, indent=1, sort_keys=True)
                print(f"manifest updated: {MANIFEST} — commit it with the fix")
            else:
                print("review, then re-run with --update to accept")
            sys.exit(1)
        print(f"no drift across {len(dirs)} dirs")
        if update:
            with open(MANIFEST, "w") as fh:
                json.dump(cur, fh, indent=1, sort_keys=True)
    else:
        with open(MANIFEST, "w") as fh:
            json.dump(cur, fh, indent=1, sort_keys=True)
        print(f"manifest written: {MANIFEST} (first run) — commit it")


if __name__ == "__main__":
    main()

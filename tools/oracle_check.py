#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read the Verify
output dir, run each oracle SQL in DuckDB over the same sf tables, and
compare canonically (columns sorted by name, rows sorted, exact values).
Usage: oracle_check.py <sfDir> <verifyOutDir> [jsonArtifactPath]

With a third argument, also writes a per-query JSON artifact
(CORRECTNESS_LOCAL.json shape) so the round carries a durable local
correctness record even if the driver-side gate times out.
"""
import sys, json, glob, math, time
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
artifact_path = sys.argv[3] if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
results = {}
t_start = time.time()
for name, sql in sorted(oracle.items()):
    q0 = time.time()
    pdir = f"{out}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    def record(status, rows=None, detail=None):
        results[name] = {"status": status, "rows": rows,
                         "secs": round(time.time() - q0, 2)}
        if detail:
            results[name]["detail"] = detail
    if not files:
        fails.append(name); print(f"MISSING-OUTPUT {name}"); record("missing_output"); continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    except Exception as e:
        fails.append(name); print(f"READ-FAIL {name}: {e}"); record("read_fail", detail=str(e)); continue
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        fails.append(name); print(f"ORACLE-FAIL {name}: {e}"); record("oracle_fail", detail=str(e)[:500]); continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        fails.append(name); print(f"SCHEMA {name}: got {gc} exp {ec}")
        record("schema_mismatch", detail=f"got {gc} exp {ec}"); continue
    got, exp = got[gc], exp[gc]
    if len(got) != len(exp):
        fails.append(name); print(f"ROWS {name}: got {len(got)} exp {len(exp)}")
        record("row_count_mismatch", rows=len(got), detail=f"expected {len(exp)}"); continue
    g = got.sort_values(gc).reset_index(drop=True)
    e = exp.sort_values(gc).reset_index(drop=True)
    bad = None
    for c in gc:
        gv, ev = g[c], e[c]
        try:
            ev_cast = ev.astype(gv.dtype)
        except Exception:
            ev_cast = ev
        eq = gv.fillna("__N__").astype(str).eq(ev_cast.fillna("__N__").astype(str)) \
            if gv.dtype == object else (gv.isna() & ev_cast.isna()) | (gv == ev_cast)
        if not eq.all():
            i = (~eq).idxmax()
            bad = (c, gv.iloc[i], ev_cast.iloc[i], int((~eq).sum()))
            break
    if bad:
        fails.append(name)
        print(f"VALUES {name}: col={bad[0]} got={bad[1]!r} exp={bad[2]!r} ({bad[3]} diffs) dtypes got={g[bad[0]].dtype} exp={e[bad[0]].dtype}")
        record("value_mismatch", rows=len(got),
               detail=f"col={bad[0]} got={bad[1]!r} exp={bad[2]!r} ({bad[3]} diffs)")
    else:
        print(f"OK {name} ({len(got)} rows)")
        record("ok", rows=len(got))
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} OK")
if artifact_path:
    artifact = {
        "sf_dir": sf,
        "gate_secs": round(time.time() - t_start, 1),
        "ok": len(oracle) - len(fails),
        "total": len(oracle),
        "exit": 1 if fails else 0,
        "generated_unix": int(t_start),
        "queries": results,
    }
    with open(artifact_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"wrote {artifact_path}")
sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""Validate a committed bench artifact (BENCH_LAST.json) for
completeness before it is committed: the driver's stdout tail has
truncated the bench JSON line in past rounds, so the file artifact is
the only reliable record — this check makes an incomplete one loud.

Checks:
  1. the file parses as one JSON object with the Bench contract fields
  2. every query name in SparkEntry.queries appears in "queries"
     (names are scraped from SparkEntry.scala's `"q..." ->` entries —
     no JVM needed at commit time)
  3. "failures" is empty and no query carries the poison value (>=1e9)

Usage: bench_check.py [BENCH_LAST.json [SparkEntry.scala]]
Exit 0 = complete; 1 = anything missing/failed (prints what).
"""
import json
import re
import sys

bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LAST.json"
entry_path = (sys.argv[2] if len(sys.argv) > 2
              else "src/main/scala/graft/SparkEntry.scala")

problems = []

try:
    bench = json.load(open(bench_path))
except Exception as e:  # noqa: BLE001 - anything unparseable is the finding
    print(f"FAIL {bench_path}: does not parse as JSON ({e})")
    sys.exit(1)

for field in ("metric", "value", "unit", "queries", "sf"):
    if field not in bench:
        problems.append(f"missing field: {field}")

timed = bench.get("queries", {}) or {}

# Scrape the declared query names. The queries map starts at
# `def queries` and every entry is a `"name" -> ...` binding; oracleSql
# reuses the same names, so collecting every distinct "q..." -> key in
# the file over-approximates at worst by oracle-only names (none exist:
# the gate requires queries ⊇ oracleSql).
src = open(entry_path, encoding="utf-8").read()
declared = set(re.findall(r'"(q[0-9a-z_]+)"\s*->', src))
if not declared:
    problems.append(f"no query declarations found in {entry_path}")

missing = sorted(declared - set(timed))
extra = sorted(set(timed) - declared)
if missing:
    problems.append(f"{len(missing)} declared queries missing from bench: "
                    + ", ".join(missing))
if extra:
    problems.append(f"{len(extra)} benched queries not declared (stale?): "
                    + ", ".join(extra))

failures = bench.get("failures", [])
if failures:
    problems.append(f"failures listed: {failures}")
poisoned = sorted(k for k, v in timed.items() if v >= 1e9)
if poisoned:
    problems.append(f"poisoned timings: {poisoned}")

if problems:
    for p in problems:
        print(f"FAIL {bench_path}: {p}")
    sys.exit(1)

print(f"OK {bench_path}: {len(timed)} queries, total "
      f"{bench.get('value')}{bench.get('unit', '')}, sf={bench.get('sf')}, "
      f"no failures")

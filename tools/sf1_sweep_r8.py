"""Round-8 sf1 disposition sweep: run every registry row that has no
recorded sf1 value row (SF1_VALUES.md) or execution row (SCALE_SF1.md)
through the driver-contract replay at the synthesized sf1, one query
per subprocess so a quadratic oracle or an OOM cannot take down the
sweep. Emits one status line per query:

  OK      — Spark vs DuckDB hash-exact at sf1
  TIMEOUT — did not finish inside the per-query budget (quadratic
            oracle class; execution receipt comes from scale_smoke)
  FAIL    — ran but mismatched / raised (a real finding)
"""
import json
import os
import subprocess
import sys
import time

if len(sys.argv) < 2:
    sys.exit("usage: sf1_sweep_r8.py <q1,q2,...> [per-query budget s]")
QUERIES = sys.argv[1].split(",")
BUDGET = int(sys.argv[2]) if len(sys.argv) > 2 else 240
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".scaledata", "sf1")

results = {}
for q in QUERIES:
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, "tools/replay.py", SF1, q],
            capture_output=True, text=True, timeout=BUDGET,
            cwd=REPO,
        )
        out = p.stdout + p.stderr
        dt = time.time() - t0
        if "FAILS: none" in out:
            results[q] = {"status": "OK", "s": round(dt, 1)}
        else:
            tail = [ln for ln in out.splitlines() if q in ln][-3:]
            results[q] = {
                "status": "FAIL", "s": round(dt, 1), "detail": tail
            }
    except subprocess.TimeoutExpired:
        results[q] = {"status": "TIMEOUT", "s": BUDGET}
    print(q, json.dumps(results[q]), flush=True)

print("== summary ==")
for s in ("OK", "FAIL", "TIMEOUT"):
    names = [q for q, r in results.items() if r["status"] == s]
    print(f"{s}: {len(names)}", " ".join(names))

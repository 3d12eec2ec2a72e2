#!/usr/bin/env python3
"""Compute per-query 0.1->1 scaling exponents from two Bench JSON lines.

Usage: exponents.py <bench_sf01.json> <bench_sf1.json> [scale_ratio=10]

Prints a markdown table sorted by exponent descending, plus a summary.
The exponent is log(t1/t0)/log(ratio); floor-bound queries (t0 < 0.15s
and t1 < 0.3s) are reported as 'floor' since the ratio is dominated by
fixed per-query cost, not data work.
"""
import json, math, sys

def load(p):
    with open(p) as f:
        txt = f.read()
    # file may be a raw sbt log (lines prefixed "[info] "); find the
    # JSON line and strip anything before its first brace
    for line in txt.splitlines():
        i = line.find('{')
        if i >= 0 and '"queries"' in line:
            return json.loads(line[i:])
    return json.loads(txt)

a = load(sys.argv[1])
b = load(sys.argv[2])
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
qa, qb = a["queries"], b["queries"]
rows = []
for q in qa:
    if q not in qb:
        continue
    t0, t1 = qa[q], qb[q]
    if t0 <= 0 or t1 <= 0:
        continue
    exp = math.log(t1 / t0) / math.log(ratio)
    floor = t0 < 0.15 and t1 < 0.35
    rows.append((q, t0, t1, exp, floor))
rows.sort(key=lambda r: -r[3])
print(f"| query | sf0.1 s | sf1 s | exponent | note |")
print(f"|---|---|---|---|---|")
for q, t0, t1, exp, floor in rows:
    note = "floor-bound" if floor else ""
    print(f"| {q} | {t0:.3f} | {t1:.3f} | {exp:+.2f} | {note} |")
sup = [r for r in rows if r[3] > 1.15 and not r[4]]
print()
print(f"total sf0.1 sum={sum(r[1] for r in rows):.1f}s sf1 sum="
      f"{sum(r[2] for r in rows):.1f}s  aggregate exponent="
      f"{math.log(sum(r[2] for r in rows)/sum(r[1] for r in rows))/math.log(ratio):.2f}")
print(f"super-linear (exp>1.15, non-floor): {[r[0] for r in sup]}")
print(f"missing in sf1: {sorted(set(qa)-set(qb))}")

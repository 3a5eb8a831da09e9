#!/usr/bin/env python3
"""Compare a scale-rehearsal bench run against the sf0.1 baseline.

Usage: python3 scripts/scale_compare.py [BENCH_sf1.json] [bench_out.json]

Prints per-query growth factors (sf1 sec / sf0.1 sec) sorted descending and
flags queries growing more than FLAG_FACTOR on 10x data. Fixed-cost queries
(sub-0.2 s at sf0.1) are reported but not flagged — their 'growth' is noise
on a constant.
"""
import json
import sys

FLAG_FACTOR = 15.0
NOISE_FLOOR_SEC = 0.2

def main(sf1_path: str, base_path: str) -> int:
    sf1 = json.load(open(sf1_path))
    base = json.load(open(base_path))
    q1, q0 = sf1["queries"], base["queries"]
    rows = []
    for k in sorted(q1):
        if k not in q0:
            continue
        a, b = q0[k], q1[k]
        if a < 0 or b < 0:
            rows.append((float("inf"), k, a, b, "FAILED"))
            continue
        factor = b / a if a > 0 else float("inf")
        flag = ""
        if factor > FLAG_FACTOR and a >= NOISE_FLOOR_SEC:
            flag = f"FLAG >{FLAG_FACTOR:.0f}x"
        elif a < NOISE_FLOOR_SEC:
            flag = "(fixed-cost baseline)" if factor > FLAG_FACTOR else ""
        rows.append((factor, k, a, b, flag))
    rows.sort(reverse=True)
    print(f"{'query':<28} {'sf0.1':>8} {'sf1':>8} {'factor':>8}  note")
    for factor, k, a, b, flag in rows:
        print(f"{k:<28} {a:>8.3f} {b:>8.3f} {factor:>8.2f}  {flag}")
    flagged = [k for f, k, a, b, fl in rows if fl.startswith("FLAG") or fl == "FAILED"]
    print(f"\ntotal sf0.1={base['value']:.1f}s sf1={sf1['value']:.1f}s "
          f"median sf0.1={base['median_query_sec']:.3f}s sf1={sf1['median_query_sec']:.3f}s")
    print("flagged:", flagged or "none")
    return 1 if flagged else 0

if __name__ == "__main__":
    a = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/BENCH_sf1.json"
    b = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/bench_out.json"
    sys.exit(main(a, b))

#!/usr/bin/env python3
"""Slope table for the sf1 -> sf10 soak (round-18 VERDICT task 4):
reads two graft.Bench per-query JSON artifacts produced with the SAME
query subset and methodology (interleaved repeat, min per query) and
prints per-query times plus the slope at 10x data. Subset-run inflation
(~1.4x, see COVERAGE) cancels in the ratio because both runs use the
same subset.

Usage: python3 tools/soak_slopes.py /tmp/soak_sf1.json /tmp/soak_sf10.json
"""
import json
import sys


def main() -> None:
    lo_path, hi_path = sys.argv[1], sys.argv[2]
    lo = json.load(open(lo_path))
    hi = json.load(open(hi_path))
    qlo, qhi = lo["queries"], hi["queries"]
    rows = []
    for name in sorted(set(qlo) | set(qhi)):
        a, b = qlo.get(name), qhi.get(name)
        if a is None or b is None or a < 0 or b < 0:
            rows.append((name, a, b, None))
        else:
            rows.append((name, a, b, b / max(a, 1e-9)))
    print(f"{'query':38s} {'sf1_s':>8s} {'sf10_s':>9s} {'slope':>7s}")
    for name, a, b, slope in rows:
        sa = "-" if a is None else f"{a:.2f}"
        sb = "-" if b is None else f"{b:.2f}"
        ss = "FAIL" if slope is None else f"{slope:.1f}x"
        print(f"{name:38s} {sa:>8s} {sb:>9s} {ss:>7s}")
    ok = [r for r in rows if r[3] is not None]
    if ok:
        tot_a = sum(r[1] for r in ok)
        tot_b = sum(r[2] for r in ok)
        print(f"{'TOTAL':38s} {tot_a:8.2f} {tot_b:9.2f} "
              f"{tot_b / max(tot_a, 1e-9):6.1f}x")
    print(f"errors: sf1={lo.get('errors')} sf10={hi.get('errors')}")


if __name__ == "__main__":
    main()

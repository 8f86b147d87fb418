#!/usr/bin/env python3
"""Scale-slope analysis: per-query t(sf1)/t(sf0.1) ratios.

Usage: python3 tools/slope.py [sf01_detail.json ...] -- sf1_detail.json

Denominator: per-query MIN across all given sf0.1 detail artifacts (min
across back-to-back runs cancels ambient load; min cannot overstate a
true cost). Numerator: per-query MIN from the sf1 detail artifact.
Prints every query sorted by ratio desc, flagging ratios > 15 on the
10x data (the VERDICT threshold) and sentinels.

Builder-side tooling only — NOT part of the shipped library.
"""
import json
import sys

# adjudicated non-defect slopes: queries whose cost is linear in BYTES,
# not rows (MakeScale's word-suffixing grows chars/row on the blown-up
# copies), flagged so future sweeps don't re-litigate them (round 10:
# q19 at 10.9x was exactly this)
BYTES_LINEAR = {"q19_text_normalize"}


def mins(paths):
    out = {}
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        for name, q in d["queries"].items():
            t = q["min"]
            if t is not None and t > 0:
                out[name] = min(out.get(name, float("inf")), t)
    return out


def main():
    argv = sys.argv[1:]
    sep = argv.index("--")
    base = mins(argv[:sep])
    hi = mins(argv[sep + 1:])
    rows = []
    for name in sorted(set(base) | set(hi)):
        b, h = base.get(name), hi.get(name)
        if b is None or h is None:
            rows.append((float("inf"), name, b, h, "SENTINEL/MISSING"))
        else:
            r = h / b
            if name in BYTES_LINEAR:
                flag = "bytes"
            else:
                flag = ">15x" if r > 15 else ("<lin" if r < 10 else "")
            rows.append((r, name, b, h, flag))
    rows.sort(reverse=True)
    print(f"{'ratio':>8}  {'sf0.1':>8}  {'sf1':>8}  flag   query")
    for r, name, b, h, flag in rows:
        rs = f"{r:8.2f}" if r != float("inf") else "     inf"
        bs = f"{b:8.3f}" if b is not None else "       -"
        hs = f"{h:8.3f}" if h is not None else "       -"
        print(f"{rs}  {bs}  {hs}  {flag:6} {name}")
    fin = [r for r, *_ in rows if r != float("inf")]
    if fin:
        import statistics
        print(f"\nqueries={len(fin)} median={statistics.median(fin):.2f} "
              f"mean={sum(fin)/len(fin):.2f} "
              f">15x={sum(1 for r in fin if r > 15)} "
              f"sum_sf01={sum(base.values()):.1f}s sum_sf1={sum(hi.values()):.1f}s")


if __name__ == "__main__":
    main()

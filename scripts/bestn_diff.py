#!/usr/bin/env python
"""Dissect -bestn N placement-set divergence vs the reference binary.

Usage: python scripts/bestn_diff.py ours.m4 ref.m4

For each read classified ours-superset / ours-subset / divergent by
compare_golden.py -sets, print the unmatched records with score context so
the structural cause (pruning gate, tie order, window miss) is visible.
"""

import sys
from collections import Counter


def parse(path):
    out = {}
    for line in open(path):
        f = line.split()
        if len(f) < 13:
            continue
        name = f[0]
        if name.count("/") >= 1:
            base, _, tail = name.rpartition("/")
            if "_" in tail:
                name = base
        out.setdefault(name, []).append(
            dict(tname=f[1], score=int(f[2]), pct=float(f[3]),
                 qstart=int(f[5]), qend=int(f[6]), qlen=int(f[7]),
                 strand=int(f[8]), tstart=int(f[9]), tend=int(f[10]),
                 mapqv=int(f[12]))
        )
    return out


def match(x, y):
    if x["tname"] != y["tname"] or x["strand"] != y["strand"]:
        return False
    lo = max(x["tstart"], y["tstart"])
    hi = min(x["tend"], y["tend"])
    return (hi - lo) / max(
        x["tend"] - x["tstart"], y["tend"] - y["tstart"], 1) >= 0.9


def main():
    ours, ref = parse(sys.argv[1]), parse(sys.argv[2])
    common = sorted(set(ours) & set(ref))
    cats = Counter()
    sup_stats = Counter()   # patterns among our extra records
    sub_stats = Counter()   # patterns among missing ref records
    examples = {"sup": [], "sub": [], "div": []}
    for n in common:
        a, b = ours[n], ref[n]
        a_extra = [x for x in a if not any(match(x, y) for y in b)]
        b_extra = [y for y in b if not any(match(y, x) for x in a)]
        if not a_extra and not b_extra:
            cats["equal"] += 1
            continue
        if a_extra and not b_extra:
            cats["sup"] += 1
            best = min(r["score"] for r in a)
            for x in a_extra:
                # how much worse than our best placement is the extra one?
                rel = x["score"] - best
                span = x["qend"] - x["qstart"]
                frac = span / max(x["qlen"], 1)
                key = (
                    "worse>200" if rel > 200 else
                    "worse50-200" if rel > 50 else "near-best",
                    "shortspan" if frac < 0.5 else "fullspan",
                )
                sup_stats[key] += 1
            if len(examples["sup"]) < 8:
                examples["sup"].append((n, a, b))
        elif b_extra and not a_extra:
            cats["sub"] += 1
            bestb = min(r["score"] for r in b)
            for y in b_extra:
                rel = y["score"] - bestb
                span = y["qend"] - y["qstart"]
                frac = span / max(y["qlen"], 1)
                key = (
                    "worse>200" if rel > 200 else
                    "worse50-200" if rel > 50 else "near-best",
                    "shortspan" if frac < 0.5 else "fullspan",
                )
                sub_stats[key] += 1
            if len(examples["sub"]) < 8:
                examples["sub"].append((n, a, b))
        else:
            cats["div"] += 1
            if len(examples["div"]) < 8:
                examples["div"].append((n, a, b))
    print("categories:", dict(cats))
    print("\nours-extra record patterns (rel-score vs our best, span):")
    for k, v in sorted(sup_stats.items()):
        print(f"  {k}: {v}")
    print("\nref-extra record patterns (rel-score vs ref best, span):")
    for k, v in sorted(sub_stats.items()):
        print(f"  {k}: {v}")
    for cat in ("sup", "sub", "div"):
        print(f"\n==== {cat} examples ====")
        for n, a, b in examples[cat][:4]:
            print(f"-- {n}")
            for x in sorted(a, key=lambda r: r["score"]):
                print(f"   ours {x['tname']} s{x['strand']} "
                      f"t{x['tstart']}-{x['tend']} q{x['qstart']}-{x['qend']}"
                      f" score {x['score']} mq {x['mapqv']}")
            for y in sorted(b, key=lambda r: r["score"]):
                print(f"   ref  {y['tname']} s{y['strand']} "
                      f"t{y['tstart']}-{y['tend']} q{y['qstart']}-{y['qend']}"
                      f" score {y['score']} mq {y['mapqv']}")


if __name__ == "__main__":
    main()

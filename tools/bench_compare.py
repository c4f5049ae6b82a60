#!/usr/bin/env python3
"""Window-corrected bench comparison (round-10, verdict item 8).

This box's throughput drifts up to 1.8x on identical code (hypervisor
steal invisible to load_avg), so raw suite totals from different windows
are not comparable. The robust protocol, used by the round-9 verdict and
mechanized here: take two BENCH_DETAIL files and a list of TOUCHED query
names; the UNTOUCHED queries are a same-code control set, so the median
of their per-query ratios estimates the environment factor between the
two windows; every touched query's ratio divided by that factor is its
window-corrected speedup.

Usage:
  tools/bench_compare.py BEFORE.json AFTER.json [touched.txt|q_a,q_b,...]

touched: a file with one query name per line, or a comma list, or omitted
(then every query is reported raw and the env factor is the all-query
median). Output: one JSON object on stdout with env_factor, per-query raw
and corrected ratios, and geomeans. ratio > 1 means AFTER is faster.
"""
import json
import math
import os
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("queries", {}), d


def geomean(xs):
    xs = [x for x in xs if x > 0]
    if not xs:
        return None
    return math.exp(sum(math.log(x) for x in xs) / len(xs))


def median(xs):
    s = sorted(xs)
    n = len(s)
    if n == 0:
        return None
    return s[n // 2] if n % 2 == 1 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    before, bmeta = load(sys.argv[1])
    after, ameta = load(sys.argv[2])
    touched = set()
    if len(sys.argv) > 3:
        arg = sys.argv[3]
        if os.path.exists(arg):
            with open(arg) as f:
                touched = {l.strip() for l in f if l.strip()}
        else:
            touched = {q.strip() for q in arg.split(",") if q.strip()}
    common = sorted(set(before) & set(after))
    # ratio > 1 == faster after
    ratios = {q: before[q] / after[q] for q in common if after[q] > 0}
    control = [q for q in common if q not in touched]
    env = median([ratios[q] for q in control if q in ratios]) or 1.0
    out = {
        "n_common": len(common),
        "n_touched": len([q for q in common if q in touched]),
        "n_control": len(control),
        "env_factor": env,  # >1: AFTER window was faster on identical code
        "steal_pct_before": bmeta.get("steal_pct"),
        "steal_pct_after": ameta.get("steal_pct"),
        "total_before": bmeta.get("value"),
        "total_after": ameta.get("value"),
        "geomean_raw_all": geomean([ratios[q] for q in common if q in ratios]),
        "geomean_corrected_touched": geomean(
            [ratios[q] / env for q in common if q in touched and q in ratios]),
        "per_query": {
            q: {
                "before": before[q],
                "after": after[q],
                "raw": round(ratios[q], 4),
                "corrected": round(ratios[q] / env, 4),
                "touched": q in touched,
            }
            for q in common if q in ratios
        },
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

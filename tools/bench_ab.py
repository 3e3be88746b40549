#!/usr/bin/env python3
"""Controlled A/B analysis of bench_full.json runs (hybrid-trend
attribution, r19): compare two same-session HEAD runs (within-head
variance) against an r16-code-head run (cross-head delta), per query.

Usage: bench_ab.py HEAD_A.json HEAD_B.json R16.json [family_substring...]
"""
import json
import statistics
import sys


def load(p):
    d = json.load(open(p))
    return d["queries"], d.get("corpus_id"), d["value"]


def main():
    a, ca, ta = load(sys.argv[1])
    b, cb, tb = load(sys.argv[2])
    r, cr, tr = load(sys.argv[3])
    fams = sys.argv[4:] or ["hybrid", "prf"]
    assert ca == cb == cr, f"corpus mismatch: {ca} {cb} {cr}"
    common = sorted(set(a) & set(b) & set(r))
    print(f"corpus {ca}; totals A={ta:.1f} B={tb:.1f} r16={tr:.1f}; "
          f"{len(common)} common queries")
    # within-head variance: |A-B|/mean per query -> the noise floor
    noise = sorted(abs(a[q] - b[q]) / ((a[q] + b[q]) / 2) for q in common
                   if (a[q] + b[q]) / 2 > 0.05)
    med_noise = statistics.median(noise)
    p90_noise = noise[int(0.9 * len(noise))]
    print(f"within-head |A-B| rel: median {med_noise:.1%}, p90 {p90_noise:.1%}")
    # cross-head: HEAD(best of A,B) vs r16 per query
    print(f"\n{'query':34s} {'r16':>7s} {'A':>7s} {'B':>7s} "
          f"{'best/r16':>9s} {'|A-B|rel':>9s}")
    flagged = []
    for q in common:
        best = min(a[q], b[q])
        ratio = best / r[q] if r[q] > 0 else float("inf")
        ab = abs(a[q] - b[q]) / ((a[q] + b[q]) / 2)
        fam = any(f in q for f in fams)
        # a real regression: best-of-two HEAD beats noise band vs r16
        if fam or (ratio > 1 + 2 * p90_noise and best - r[q] > 0.1):
            flagged.append((q, r[q], a[q], b[q], ratio, ab, fam))
    for q, rq, aq, bq, ratio, ab, fam in sorted(flagged, key=lambda x: -x[4]):
        tag = " <- family" if fam else ""
        print(f"{q:34s} {rq:7.3f} {aq:7.3f} {bq:7.3f} {ratio:9.2f} "
              f"{ab:9.1%}{tag}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Per-query comparison of two bench artifacts (the analysis the r8/r9
verdicts computed by hand, shipped as a tool so every round's NOTES can
quote it reproducibly).

Usage: tools/bench_diff.py OLD.json NEW.json [topN]
  OLD/NEW: BENCH_FULL.json files (or a git ref spec like
           500bb38:BENCH_FULL.json — anything `git show` accepts when
           the path contains a colon).

Prints: totals, common-subset sums and sum/median ratios, the topN
regressions and improvements, and queries present on only one side.
"""
import json, os, subprocess, sys


def load(spec):
    # A plain readable path wins; anything else with a colon is a git
    # ref spec (ref:path - the ref may itself contain slashes, e.g.
    # origin/main:BENCH_FULL.json, and the path may too, so no amount
    # of string-splitting beats just checking the filesystem first).
    if os.path.exists(spec):
        return json.load(open(spec))
    if ":" in spec:
        out = subprocess.run(["git", "show", spec], capture_output=True, text=True)
        if out.returncode != 0:
            sys.exit(f"git show {spec} failed: {out.stderr.strip()}")
        return json.loads(out.stdout)
    sys.exit(f"not a file and not a git ref spec: {spec}")


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    so, sn = sum(qo[k] for k in common), sum(qn[k] for k in common)
    ratios = sorted((qn[k] / qo[k] if qo[k] > 0 else float("inf")) for k in common)
    med = ratios[len(ratios) // 2]
    print(f"old total {old['value']:.2f} s ({len(qo)} queries)  "
          f"new total {new['value']:.2f} s ({len(qn)} queries)")
    print(f"common subset: {len(common)} queries, sum {so:.2f} -> {sn:.2f} s "
          f"(sum ratio {sn / so:.2f}, median per-query ratio {med:.2f})")
    diffs = sorted(((qn[k] - qo[k], k) for k in common), reverse=True)
    print(f"\ntop {top_n} regressions (absolute seconds):")
    for d, k in diffs[:top_n]:
        if d <= 0:
            break
        print(f"  +{d:5.2f}  {k}: {qo[k]} -> {qn[k]}")
    print(f"\ntop {top_n} improvements:")
    for d, k in reversed(diffs[-top_n:]):
        if d >= 0:
            break
        print(f"  {d:6.2f}  {k}: {qo[k]} -> {qn[k]}")
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    if only_old:
        print(f"\nremoved ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"\nadded ({len(only_new)}): " + ", ".join(
            f"{k} ({qn[k]}s)" for k in only_new))


if __name__ == "__main__":
    main()

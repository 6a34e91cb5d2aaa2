#!/usr/bin/env python3
"""Round-over-round bench comparison.

Usage: bench_diff.py <old_headline.json> <new_headline.json>
       [--metric queries_warm] [--rel 0.3] [--abs 0.3]

Compares per-query times between two graft.Bench headline artifacts
(target/bench_headline.json or a BENCH_r{N}.json whose `parsed` field
holds one) and prints regressions, improvements, and coverage deltas.
A row is flagged only when BOTH the relative and absolute thresholds
trip — sub-second queries jitter relatively, multi-second ones
absolutely, and requiring both keeps noise out of the verdict.

CAVEAT the tool enforces: artifacts from different thread counts
(SPARK_GRAFT_CPUS) are not comparable; if both artifacts carry a
`cpus` field and they differ, the tool says so and exits non-zero
instead of printing misleading deltas.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    # driver BENCH_r{N}.json wrapper: the headline lives under `parsed`,
    # or (when the driver's parse failed) as a JSON line inside `tail`
    if "queries" not in d and isinstance(d.get("parsed"), dict) \
            and "queries" in d["parsed"]:
        d = {**d["parsed"], "cpus": d.get("cpus")}
    elif "queries" not in d and isinstance(d.get("tail"), str):
        for line in reversed(d["tail"].splitlines()):
            i = line.find("{")
            if i < 0:
                continue
            try:
                cand = json.loads(line[i:])
            except json.JSONDecodeError:
                continue
            if "queries" in cand:
                d = {**cand, "cpus": d.get("cpus")}
                break
    if "queries" not in d:
        sys.exit(f"{path}: no per-query map found (truncated artifact?)")
    return d


def main():
    # simple flag parsing: --metric M --rel R --abs A
    rest = sys.argv[1:]
    metric, rel_thr, abs_thr = "queries_warm", 0.3, 0.3
    paths = []
    i = 0
    while i < len(rest):
        if rest[i] == "--metric":
            metric = rest[i + 1]; i += 2
        elif rest[i] == "--rel":
            rel_thr = float(rest[i + 1]); i += 2
        elif rest[i] == "--abs":
            abs_thr = float(rest[i + 1]); i += 2
        else:
            paths.append(rest[i]); i += 1
    if len(paths) != 2:
        sys.exit(__doc__)
    old, new = load(paths[0]), load(paths[1])
    c_old, c_new = old.get("cpus"), new.get("cpus")
    if c_old is not None and c_new is not None and c_old != c_new:
        sys.exit(f"not comparable: cpus {c_old} vs {c_new} "
                 "(thread count changes every number)")
    mo, mn = old.get(metric, {}), new.get(metric, {})
    common = sorted(set(mo) & set(mn))
    added = sorted(set(mn) - set(mo))
    removed = sorted(set(mo) - set(mn))

    def flag(a, b):
        return b > a * (1 + rel_thr) and b - a > abs_thr

    regs = [(n, mo[n], mn[n]) for n in common
            if mo[n] >= 0 and mn[n] >= 0 and flag(mo[n], mn[n])]
    imps = [(n, mo[n], mn[n]) for n in common
            if mo[n] >= 0 and mn[n] >= 0 and flag(mn[n], mo[n])]
    regs.sort(key=lambda r: r[1] - r[2])
    imps.sort(key=lambda r: r[2] - r[1])

    tot = lambda m, ks: sum(v for k, v in m.items() if k in ks and v >= 0)
    print(f"metric={metric}  rel>{rel_thr:.0%} AND abs>{abs_thr}s")
    print(f"common queries: {len(common)}  "
          f"total {tot(mo, common):.1f}s -> {tot(mn, common):.1f}s")
    # Pollution context (round 20): hypervisor steal is the dominant
    # cross-round variance on this rig (chronic ~25-30%, time-varying),
    # so raw ratios between boards from different steal windows mislead.
    # When both boards carry steal_frac, print the crude steal-adjusted
    # totals (t * (1 - steal) ~ the steal-free-equivalent time; first-
    # order only — steal concentrates under demand).
    for tag, d in (("old", old), ("new", new)):
        bits = []
        if d.get("steal_frac") is not None:
            bits.append(f"steal_frac={d['steal_frac']}")
        if isinstance(d.get("foreign_cpu"), dict):
            fc = d["foreign_cpu"]
            bits.append(f"foreign_cpu median={fc.get('median')} p90={fc.get('p90')}")
        if d.get("degraded") is not None:
            bits.append(f"degraded={d['degraded']}")
        if bits:
            print(f"{tag}: " + "  ".join(bits))
    so, sn = old.get("steal_frac"), new.get("steal_frac")
    if isinstance(so, (int, float)) and isinstance(sn, (int, float)) \
            and 0 <= so < 1 and 0 <= sn < 1:
        ao, an = tot(mo, common) * (1 - so), tot(mn, common) * (1 - sn)
        print(f"steal-adjusted totals: {ao:.1f}s -> {an:.1f}s "
              f"(ratio {an / ao:.2f} vs raw "
              f"{tot(mn, common) / max(tot(mo, common), 1e-9):.2f})")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"REMOVED ({len(removed)}): {', '.join(removed)}")
    print(f"\nregressions ({len(regs)}):")
    for n, a, b in regs:
        print(f"  {n:28s} {a:7.2f} -> {b:7.2f}  (+{b - a:.2f}s)")
    print(f"improvements ({len(imps)}):")
    for n, a, b in imps:
        print(f"  {n:28s} {a:7.2f} -> {b:7.2f}  (-{a - b:.2f}s)")
    sys.exit(1 if regs else 0)


if __name__ == "__main__":
    main()

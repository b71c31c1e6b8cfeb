#!/usr/bin/env python3
"""Fold a bench run into the self-generated floor table in BASELINE.md.

Usage: python tools/bench_to_baseline.py <bench.json> [--replace]

Default is a MIN-FOLD: each query's floor is min(existing floor, this
run) — a noisy run can only tighten floors, never loosen them, and new
queries gain a first floor. Two guards keep the fold honest:
  - the existing table's recorded sf dir must match this run's (floors
    from different scale factors must never min-fold together);
  - queries absent from this run (renamed/removed catalog entries) are
    DROPPED, so the floor-sum always corresponds to the runnable
    catalog.
`--replace` rewrites the table from this run alone (deliberate reset,
e.g. after a fixture regeneration that invalidates every floor).
"""
import json
import re
import sys

MARK = "<!-- graft-bench-table -->"


def main(path: str, replace: bool = False, refloor: set = frozenset()) -> None:
    d = json.load(open(path))
    merged = dict(d["queries"])
    # a refloor name absent from this run would silently DELETE its
    # floor row (disabling both rescue gates for that query) — and a
    # typo would silently min-fold the real row instead; both must err
    missing_refloor = refloor - set(merged)
    if missing_refloor:
        sys.exit(f"--refloor names not measured in this run: "
                 f"{', '.join(sorted(missing_refloor))}")
    md = open("BASELINE.md").read()
    start = md.find(MARK)
    if not replace and start >= 0:
        block = md[start:]
        prev_sf = re.search(r"### Self-generated bench \(graft, `([^`]+)`", block)
        if prev_sf and prev_sf.group(1) != d["sf"]:
            sys.exit(
                f"refusing to min-fold across scale factors: table has "
                f"{prev_sf.group(1)!r}, run has {d['sf']!r} (use --replace)")
        dropped = []
        for m in re.finditer(r"\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|", block):
            q, f = m.group(1), float(m.group(2))
            if q in refloor:
                continue  # deliberate re-floor: this run's value stands
            if q in merged:
                merged[q] = min(merged[q], f)
            else:
                dropped.append(q)
        if dropped:
            print(f"dropped stale floors (not in this run): {', '.join(dropped)}")
        if refloor:
            print(f"re-floored from this run: {', '.join(sorted(refloor & set(merged)))}")
    total = sum(merged.values())
    rows = sorted(merged.items())
    lines = [
        MARK,
        "",
        f"### Self-generated bench (graft, `{d['sf']}`, local mode, min-folded floors across clean runs)",
        "",
        f"Total: **{total:.1f} s** across {len(rows)} catalog queries.",
        "",
        "| query | sec |",
        "|---|---|",
    ]
    lines += [f"| {k} | {v:.3f} |" for k, v in rows]
    block = "\n".join(lines) + "\n"
    if MARK in md:
        md = re.sub(re.escape(MARK) + r".*", block, md, flags=re.S)
    else:
        md = md.rstrip() + "\n\n" + block
    open("BASELINE.md", "w").write(md)
    mode = "replaced" if replace else "min-folded"
    print(f"BASELINE.md {mode}: {len(rows)} rows, floor-sum {total:.1f}s")


if __name__ == "__main__":
    # --refloor q1,q2,... : reset the named queries' floors to THIS
    # run's values instead of min-folding — the deliberate escape hatch
    # for a code change that makes an old floor structurally
    # unreachable (e.g. the r18 persisted-index layout made the
    # cache-path fit floors meaningless). Never use it to launder a
    # slow run: name only queries whose measured path changed.
    refloor: set = set()
    for a in sys.argv[2:]:
        if a.startswith("--refloor="):
            refloor |= set(a.split("=", 1)[1].split(","))
        elif a != "--replace":
            # ADVICE r20: a space-separated "--refloor q1,q2" (or any
            # typo'd flag) was silently ignored — the named floors then
            # min-folded as usual while the operator believed they were
            # re-floored, the exact silent failure the missing-refloor
            # exit guard exists to prevent. Unknown tokens are fatal.
            sys.exit(f"unrecognized argument: {a!r} "
                     "(expected --replace or --refloor=q1,q2,...)")
    main(sys.argv[1], replace="--replace" in sys.argv[2:], refloor=refloor)

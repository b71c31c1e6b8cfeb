#!/usr/bin/env python3
"""Append/refresh the self-generated bench table in BASELINE.md.

Usage: python tools/bench_to_baseline.py <bench.json>
"""
import json
import re
import sys

MARK = "<!-- graft-bench-table -->"


def main(path: str) -> None:
    d = json.load(open(path))
    rows = sorted(d["queries"].items())
    lines = [
        MARK,
        "",
        f"### Self-generated bench (graft, `{d['sf']}`, local mode, median of 3 after warmup)",
        "",
        f"Total: **{d['value']:.1f} s** across {len(rows)} catalog queries.",
        "",
        "| query | sec |",
        "|---|---|",
    ]
    lines += [f"| {k} | {v:.3f} |" for k, v in rows]
    block = "\n".join(lines) + "\n"
    md = open("BASELINE.md").read()
    if MARK in md:
        md = re.sub(re.escape(MARK) + r".*", block, md, flags=re.S)
    else:
        md = md.rstrip() + "\n\n" + block
    open("BASELINE.md", "w").write(md)
    print(f"BASELINE.md updated with {len(rows)} rows, total {d['value']:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1])

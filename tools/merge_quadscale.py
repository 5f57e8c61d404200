#!/usr/bin/env python3
"""Merge staged QuadScale outputs into one QUADSCALE_r{N}.json.

Usage: merge_quadscale.py <out.json> <stage.json>... — each stage file
holds one {"metric":"quadscale","sizes":[...]} line (possibly preceded
by stray JVM log lines); sizes arrays concatenate in argument order.
Dev tooling only.
"""
import sys, json

out, stages = sys.argv[1], sys.argv[2:]
sizes = []
for p in stages:
    with open(p) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"metric"'):
                sizes.extend(json.loads(line)["sizes"])
with open(out, "w") as f:
    json.dump({"metric": "quadscale", "sizes": sizes}, f)
print(f"{out}: {len(sizes)} tier sittings")

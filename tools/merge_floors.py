#!/usr/bin/env python3
"""Merge bench artifacts into per-query floors (min across passes).

Usage: merge_floors.py OUT.json NOTE IN1 [IN2 ...]
Each IN is a file whose LAST line is a graft.Bench JSON artifact.
The output keeps the artifact shape (metric/value/unit/queries/
errors/sf) with `value` = sum of the per-query minima and a `note`.
"""
import json
import sys


def last_artifact(path):
    lines = [l for l in open(path).read().splitlines() if l.strip()]
    return json.loads(lines[-1])


def main():
    out_path, note, ins = sys.argv[1], sys.argv[2], sys.argv[3:]
    merged = {}
    sf = None
    for p in ins:
        art = last_artifact(p)
        sf = art.get("sf", sf)
        for q, t in art.get("queries", {}).items():
            if t is None:
                continue
            if q not in merged or t < merged[q]:
                merged[q] = t
    art = {
        "metric": "total",
        "value": sum(merged.values()),
        "unit": "sec",
        "queries": dict(sorted(merged.items(), key=lambda kv: kv[1])),
        "errors": [],
        "sf": sf,
        "note": note,
    }
    with open(out_path, "w") as f:
        json.dump(art, f)
    print(f"{out_path}: {len(merged)} queries, total {art['value']:.1f}s")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Fold per-query MINIMUMS across several graft.Bench artifacts of the SAME
code state into one bench-shaped JSON (the builder-artifact convention on a
host with intermittent external load: a query's minimum across samples taken
tens of minutes apart stands as its quiet estimate; every input's env block
and sweep totals stay attached as provenance).

Usage: tools/fold_bench.py out.json run1.json run2.json [...]
"""
import json
import sys

out, runs = sys.argv[1], sys.argv[2:]
ds = [json.load(open(r)) for r in runs]
base = ds[0]
names = list(base["queries"].keys())
for d in ds[1:]:
    assert set(d["queries"]) == set(names), "runs cover different query sets"
folded = {}
samples = {}
for n in names:
    vals = [d["queries"][n] for d in ds if d["queries"][n] >= 0]
    folded[n] = round(min(vals), 3) if vals else -1.0
    samples[n] = sorted(round(v, 3) for d in ds for v in d["samples"][n])
errors = {}
for d in ds:
    errors.update(d.get("errors", {}))
total = round(sum(v for v in folded.values() if v >= 0), 3)
artifact = {
    "metric": "total", "value": total, "unit": "sec",
    "queries": folded, "samples": samples, "errors": errors,
    "round_trip_writes": base["round_trip_writes"],
    "fold": {
        "note": ("value sums per-query MINIMUMS across the runs below "
                 "(each itself min-of-2-interleaved-sweeps); runs are the "
                 "SAME commit, taken in separate windows so intermittent "
                 "external host load cannot inflate every sample of a query"),
        "runs": [{"value": d["value"], "env": d["env"],
                  "tiebreak": d["tiebreak"]} for d in ds],
    },
    "sf": base["sf"],
}
json.dump(artifact, open(out, "w"))
print(f"folded {len(runs)} runs -> {out}: total {total}, "
      f"errors {sorted(errors)}")

#!/usr/bin/env python3
"""Fold per-query MINIMUMS across several graft.Bench artifacts of the SAME
code state into one bench-shaped JSON (the builder-artifact convention on a
host with intermittent external load: a query's minimum across samples taken
tens of minutes apart stands as its quiet estimate; every input's env block
and sweep totals stay attached as provenance).

Error convention matches Bench.scala (lines 122-125): a query that errored
(-1 / an errors entry) in ANY run folds to -1 and is excluded from the
total — a nondeterministic failure must never bench as its lucky sample.

Inputs must be the FILE artifacts (target/bench_last.json), which carry the
per-query samples; the stdout line omits them and is rejected up front.

Usage: tools/fold_bench.py out.json run1.json run2.json [...]
"""
import json
import sys

out, runs = sys.argv[1], sys.argv[2:]
ds = [json.load(open(r)) for r in runs]
base = ds[0]
names = list(base["queries"].keys())
for r, d in zip(runs, ds):
    assert set(d["queries"]) == set(names), "runs cover different query sets"
    assert "samples" in d, (
        f"{r} has no samples key — pass the FILE artifact "
        "(target/bench_last.json), not the stdout line")
errors = {}
for d in ds:
    errors.update(d.get("errors", {}))
folded = {}
samples = {}
for n in names:
    # Bench's own convention: any errored sample marks the query errored.
    errored = n in errors or any(d["queries"][n] < 0 for d in ds)
    vals = [d["queries"][n] for d in ds if d["queries"][n] >= 0]
    folded[n] = -1.0 if errored or not vals else round(min(vals), 3)
    # -1.0 sentinels are error markers, not timings — keep them out of the
    # folded sample arrays
    samples[n] = sorted(round(v, 3)
                        for d in ds for v in d.get("samples", {}).get(n, [])
                        if v >= 0)
total = round(sum(v for v in folded.values() if v >= 0), 3)
artifact = {
    "metric": "total", "value": total, "unit": "sec",
    "queries": folded, "samples": samples, "errors": errors,
    "round_trip_writes": base["round_trip_writes"],
    "fold": {
        "note": ("value sums per-query MINIMUMS across the runs below "
                 "(each itself min-of-2-interleaved-sweeps); runs are the "
                 "SAME commit, taken in separate windows so intermittent "
                 "external host load cannot inflate every sample of a query; "
                 "a query that errored in ANY run folds to -1 and is "
                 "excluded from the total"),
        "runs": [{"value": d["value"], "env": d.get("env"),
                  "tiebreak": d.get("tiebreak")} for d in ds],
    },
    # top-level env/tiebreak from the first run (flagged): folded artifacts
    # keep the full bench shape so consumers (and a re-fold) don't crash
    "env": dict(base.get("env") or {}, folded_from_runs=len(runs)),
    "tiebreak": base.get("tiebreak"),
    "sf": base["sf"],
}
json.dump(artifact, open(out, "w"))
print(f"folded {len(runs)} runs -> {out}: total {total}, "
      f"errors {sorted(errors)}")

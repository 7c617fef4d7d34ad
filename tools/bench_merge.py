#!/usr/bin/env python3
"""Merge per-query minima across several bench artifacts of the SAME code.

The committed comparison unit on this host is the per-query MIN across
runs (BENCH_NOTES.md: episodic hypervisor CPU-steal throttling makes
totals and single-run times meaningless — a throttled run records 4-60x
a calm one with zero code change). graft.Bench already reports each
query's min over SPARK_GRAFT_BENCH_RUNS in-process passes; this tool
extends that to min over N separate run attempts, for days when no
single attempt lands wholly inside a calm window.

The output artifact carries provenance: `merged_from` (input file,
entry count, partial flag) and per-query `_runs_seen`. Totals are
recomputed from the merged minima. Partial (crashed/killed) artifacts
are accepted — a query absent from one attempt just contributes
nothing there.

Usage: python3 tools/bench_merge.py OUT.json IN1.json IN2.json [...]
"""
import json
import sys


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    out, ins = sys.argv[1], sys.argv[2:]
    best = {}
    seen = {}
    meta = []
    runs = 0
    sf = None
    errors = set()
    for path in ins:
        with open(path) as f:
            d = json.load(f)
        meta.append({"file": path, "entries": len(d["queries"]),
                     "partial": bool(d.get("partial"))})
        runs += d.get("runs", 1)
        sf = d.get("sf", sf)
        errors.update(d.get("errors", []))
        for k, v in d["queries"].items():
            if v < 0:
                continue  # errored in that attempt
            seen[k] = seen.get(k, 0) + 1
            if k not in best or v < best[k]:
                best[k] = v
    total = sum(v for k, v in best.items() if not k.startswith("_"))
    doc = {
        "metric": "total", "value": round(total, 3), "unit": "sec",
        "runs": runs, "sf": sf,
        "queries": {k: round(v, 3) for k, v in sorted(best.items())},
        "errors": sorted(errors),
        "merged_from": meta,
        "_runs_seen": {k: seen[k] for k in sorted(seen)},
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=None, separators=(",", ":"))
        f.write("\n")
    print(f"merged {len(ins)} artifacts -> {out}: {len(best)} queries, "
          f"total {total:.1f} s")


if __name__ == "__main__":
    main()

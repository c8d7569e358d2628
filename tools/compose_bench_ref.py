#!/usr/bin/env python3
"""Compose a per-row-minimum bench reference from N complete bench JSONs.

The standing min-of-attempts rule (round-15 reference discipline): each
row's committed reference time is the minimum across complete calm runs,
so ambient host inflation in any one sweep never lowers the regression
bar, while genuine optimizations (a row faster in EVERY new run) do.

Usage: compose_bench_ref.py OUT IN1 IN2 [IN3 ...]
Rows must agree across inputs (same query set); totals recomputed.
"""
import json
import sys


def main() -> None:
    out, first, *rest = sys.argv[1:]
    base = json.load(open(first))
    queries = dict(base["queries"])
    for path in rest:
        d = json.load(open(path))
        if set(d["queries"]) != set(queries):
            only_a = set(queries) - set(d["queries"])
            only_b = set(d["queries"]) - set(queries)
            raise SystemExit(
                f"query sets differ: only-in-base={sorted(only_a)[:5]} "
                f"only-in-{path}={sorted(only_b)[:5]}")
        for k, v in d["queries"].items():
            if v >= 0:
                queries[k] = min(queries[k], v) if queries[k] >= 0 else v
    meas = sorted(base.get("measurement", []))
    # Self-description (round-15 advice item 5): a composed reference is a
    # per-row MIN across sweeps — a total no single run achieved — so it
    # records its inputs, and any error row present in ANY input survives
    # into the composite instead of silently vanishing.
    input_errors = {}
    for path in sys.argv[2:]:
        for k, v in json.load(open(path)).get("errors", {}).items():
            input_errors.setdefault(k, f"{path}: {v}")
    result = {
        "metric": "total",
        "value": sum(v for v in queries.values() if v >= 0),
        "unit": "sec",
        "queries": dict(sorted(queries.items())),
        "errors": dict(sorted(input_errors.items())),
        "measurement": meas,
        "measurement_sec": sum(
            queries[k] for k in meas if queries.get(k, -1) >= 0),
        "sf": base["sf"],
        "composed_from": sys.argv[2:],
        "composition": "per-row minimum across the composed_from runs",
    }
    with open(out, "w") as f:
        json.dump(result, f, separators=(",", ":"))
        f.write("\n")
    print(f"{out}: total={result['value']:.1f}s rows={len(queries)} "
          f"measurement={result['measurement_sec']:.1f}s")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Min-merge several SAME-CODE graft bench captures into one
adjudication view.

r14 measured the ambient floor between two gate-PASSING same-code
captures at 1.05x raw / 1.09x normalized with +-1.5x per-query tails —
so a single capture's per-query number carries window luck even under
the loadavg and anchor gates. Bench itself already answers this WITHIN
a run (min-of-passes); this applies the same estimator ACROSS runs:
the per-query minimum over k accepted captures converges on the noise
floor the same way min-of-k does.

This is an ADJUDICATION VIEW, not an artifact of record: the committed
BENCH_FULL_r{N}.json stays a real end-of-round capture with its own
ambient evidence. Use the merged view to decide whether a flagged
round-over-round drift survives window luck before chasing it:

    python3 scripts/bench_merge.py BENCH_FULL_r14*.json > /tmp/r14min.json
    python3 scripts/bench_compare.py BENCH_FULL_r13.json /tmp/r14min.json

Inputs must be same-code captures (same round); the tool refuses
nothing and checks nothing — that discipline is the caller's.
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f.read().splitlines():
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    paths = sys.argv[1:]
    if len(paths) < 2:
        raise SystemExit("usage: bench_merge.py CAPTURE.json CAPTURE.json ...")
    arts = [load(p) for p in paths]
    merged = {}
    for a in arts:
        for q, t in a["queries"].items():
            if t is None or t < 0:
                continue
            merged[q] = min(merged.get(q, t), t)
    out = {
        "metric": "total",
        "sf": arts[0].get("sf"),
        "merged_from": paths,
        "captures": len(arts),
        # anchor context: the QUIETEST capture's anchors, for
        # bench_compare's normalization (min matches the estimator)
        "calib_pre": min(a.get("calib_pre", 9e9) for a in arts),
        "calib_post": min(a.get("calib_post", 9e9) for a in arts),
        "calib_str_pre": min(a.get("calib_str_pre", 9e9) for a in arts),
        "calib_str_post": min(a.get("calib_str_post", 9e9) for a in arts),
        "queries": dict(sorted(merged.items())),
        "unit": "sec",
        "value": round(sum(merged.values()), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

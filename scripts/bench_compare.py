#!/usr/bin/env python3
"""Calibration-normalized comparison of two graft bench artifacts.

Rounds 3-5 each hand-derived this comparison; this makes it one command:

    python3 scripts/bench_compare.py BENCH_FULL_r05.json BENCH_FULL_r06.json

Each artifact is one JSON line from `graft.Bench`:
    {"metric":"total","calib_pre":..,"calib_post":..,"queries":{..},..}

Per-query seconds are divided by their run's calibration anchor
(mean of calib_pre/calib_post — the fixed reference workload timed at
the start and end of the run), which cancels ambient container load.
Queries are flagged only when the NORMALIZED ratio drifts beyond the
anchor band — the uncertainty the anchors themselves moved within their
runs — so a drift that survives normalization is a plan change to chase,
and one that doesn't is ambient, closed.

Exit status: 0 (informational tool; gating is the judge's call).
"""
import json
import sys


def load(path):
    with open(path) as f:
        text = f.read()
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    # driver wrapper format: {"n":..,"tail":"..."} holding a TRUNCATED
    # stdout tail (rounds 1-4) — recover what query entries survive
    d = json.loads(text)
    if "tail" in d:
        import re
        qs = {m.group(1): float(m.group(2)) for m in
              re.finditer(r'"([A-Za-z0-9_]+)":([0-9.]+)', d["tail"])}
        qs.pop("value", None)
        qs.pop("calib_pre", None)
        qs.pop("calib_post", None)
        print(f"note: {path} is a truncated driver-tail artifact "
              f"({len(qs)} recoverable entries, head entries lost)")
        return {"queries": qs,
                "calib_pre": None, "calib_post": None}
    raise SystemExit(f"{path}: no bench JSON line found")


def anchor(d, path):
    pre, post = d.get("calib_pre"), d.get("calib_post")
    vals = [v for v in (pre, post) if isinstance(v, (int, float)) and v > 0]
    if not vals:
        return None, 1.0
    return sum(vals) / len(vals), (max(vals) / min(vals))


def main():
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    a_path, b_path = sys.argv[1], sys.argv[2]
    a, b = load(a_path), load(b_path)
    ca, band_a = anchor(a, a_path)
    cb, band_b = anchor(b, b_path)
    if ca is None or cb is None:
        # normalization needs BOTH runs' anchors; degrade to raw for
        # both sides rather than dividing one side only
        print("note: anchors missing on at least one side — raw-only "
              "comparison (normalized == raw; flag band from the "
              "anchored side, if any)")
        ca = cb = 1.0
    # uncertainty: how much the anchors moved within their own runs —
    # ratios inside this band are indistinguishable from ambient
    band = band_a * band_b
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))

    def loadavg(d):
        pre, post = d.get("loadavg_pre"), d.get("loadavg_post")
        if not isinstance(pre, (int, float)) or pre < 0:
            return " load=n/a"
        return f" load={pre:.2f}->{post:.2f}"

    def str_anchor(d):
        vals = [v for v in (d.get("calib_str_pre"), d.get("calib_str_post"))
                if isinstance(v, (int, float)) and v > 0]
        return sum(vals) / len(vals) if vals else None

    sa, sb = str_anchor(a), str_anchor(b)

    def str_note(v):
        return f" str_anchor={v:.3f}s" if v else ""

    print(f"A: {a_path}  anchor={ca:.3f}s (band {band_a:.2f}x),"
          f"{str_note(sa)}{loadavg(a)} "
          f"{len(qa)} queries, total {sum(v for v in qa.values() if v >= 0):.1f}s")
    print(f"B: {b_path}  anchor={cb:.3f}s (band {band_b:.2f}x),"
          f"{str_note(sb)}{loadavg(b)} "
          f"{len(qb)} queries, total {sum(v for v in qb.values() if v >= 0):.1f}s")
    if sa and sb:
        print(f"string-host drift (str_anchor B/A): {sb / sa:.2f}x — "
              "divide string-family normalized ratios by this before "
              "calling them plan regressions (r8 note: the integer "
              "anchor is blind to string/memory-throughput host moves)")
    print(f"normalized drift flagged beyond combined anchor band: {band:.2f}x\n")

    rows = []
    for q in shared:
        ta, tb = qa[q], qb[q]
        if ta is None or tb is None or ta < 0 or tb < 0:
            continue
        raw = tb / ta if ta > 0 else float("inf")
        norm = (tb / cb) / (ta / ca) if ta > 0 else float("inf")
        rows.append((q, ta, tb, raw, norm))

    sum_a = sum(r[1] for r in rows)
    sum_b = sum(r[2] for r in rows)
    print(f"shared set ({len(rows)} queries): raw {sum_a:.1f}s -> {sum_b:.1f}s "
          f"= {sum_b / sum_a:.2f}x; normalized "
          f"{(sum_b / cb) / (sum_a / ca):.2f}x\n")

    flagged = [r for r in rows if r[4] > band or r[4] < 1 / band]
    flagged.sort(key=lambda r: -r[4])
    if flagged:
        print(f"{'query':<34} {'A(s)':>8} {'B(s)':>8} {'raw':>6} {'norm':>6}")
        for q, ta, tb, raw, norm in flagged:
            tag = "SLOWER" if norm > 1 else "faster"
            print(f"{q:<34} {ta:>8.3f} {tb:>8.3f} {raw:>6.2f} {norm:>6.2f} {tag}")
    else:
        print("no query drifts beyond the anchor band — all ambient")
    if only_a:
        print(f"\nonly in A: {', '.join(only_a)}")
    if only_b:
        print(f"\nonly in B: {', '.join(only_b)}")


if __name__ == "__main__":
    main()

"""Per-query v2 bench diff between two rounds (VERDICT r10 item 1).

BENCH_r10+ driver artifacts carry the full 101-query v2 map encoded
positionally (`v2_ms` in committed HEADLINE_V2 order, pinned by
`v2_order_sha`). This tool decodes two records — a driver BENCH_r*.json
(tail capture) and/or a local bench_out.json — and prints the per-query
round-over-round comparison, flagging every mover whose delta exceeds
both 20% and the published spread for that query (the fence VERDICT r10
defines; spread comes from whichever record carries `queries_v2_spread`,
falling back to the other, else 0).

Usage:
  python tools/v2_diff.py BENCH_r10.json bench_out.json
  python tools/v2_diff.py BENCH_r10.json BENCH_r11.json --top 10
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _headline_v2() -> list[str]:
    """The committed HEADLINE_V2 list, read from bench.py source (the
    artifact's v2_order_sha pins against exactly this)."""
    src = open(os.path.join(os.path.dirname(__file__), "..", "bench.py")).read()
    m = re.search(r"HEADLINE_V2 = \[(.*?)\n\]", src, re.S)
    return re.findall(r'"(\w+)"', m.group(1))


def load_v2(path: str) -> tuple[dict[str, float], dict[str, float]]:
    """(per-query seconds, per-query spread seconds) from either a
    driver BENCH_r*.json (tail capture with positional v2_ms) or a
    local bench_out.json (full map)."""
    rec = json.load(open(path))
    if "tail" in rec:  # driver artifact: decode the compact stdout line
        blobs = re.findall(r"\{.*\}", rec["tail"])
        if not blobs:
            raise SystemExit(f"{path}: no JSON line in tail capture")
        rec = json.loads(blobs[-1])
    if "queries_v2" in rec:  # bench_out.json: full map, full spreads
        return dict(rec["queries_v2"]), dict(rec.get("queries_v2_spread", {}))
    if "v2_ms" not in rec:
        raise SystemExit(f"{path}: no v2 map (pre-r10 artifact?)")
    order = _headline_v2()
    sha = hashlib.sha256(",".join(order).encode()).hexdigest()[:8]
    if rec.get("v2_order_sha") != sha:
        raise SystemExit(
            f"{path}: v2_order_sha {rec.get('v2_order_sha')} != bench.py "
            f"HEADLINE_V2 sha {sha} — the list changed since that round; "
            "decode against the bench.py of that round's tree"
        )
    if len(rec["v2_ms"]) != len(order):
        raise SystemExit(f"{path}: v2_ms length {len(rec['v2_ms'])} != {len(order)}")
    return {n: ms / 1000.0 for n, ms in zip(order, rec["v2_ms"])}, {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("before")
    ap.add_argument("after")
    ap.add_argument("--top", type=int, default=10, help="movers to print")
    args = ap.parse_args()

    t0, s0 = load_v2(args.before)
    t1, s1 = load_v2(args.after)
    common = sorted(set(t0) & set(t1))
    missing = sorted(set(t0) ^ set(t1))
    if missing:
        print(f"# not in both records (skipped): {missing}")

    rows = []
    for n in common:
        d = t1[n] - t0[n]
        pct = d / t0[n] * 100 if t0[n] else 0.0
        spread = max(s0.get(n, 0.0), s1.get(n, 0.0))
        fenced = abs(pct) > 20 and abs(d) > spread
        rows.append((n, t0[n], t1[n], d, pct, spread, fenced))
    rows.sort(key=lambda r: -abs(r[3]))

    print(f"{'query':28s} {'before':>8s} {'after':>8s} {'delta':>8s} {'pct':>7s} {'spread':>7s} fence")
    for n, a, b, d, pct, spread, fenced in rows[: args.top]:
        print(
            f"{n:28s} {a:8.3f} {b:8.3f} {d:+8.3f} {pct:+6.1f}% {spread:7.3f} "
            f"{'FENCE' if fenced else '-'}"
        )
    tot0, tot1 = sum(t0[n] for n in common), sum(t1[n] for n in common)
    print(f"\ntotal over {len(common)} common queries: {tot0:.2f}s -> {tot1:.2f}s "
          f"({(tot1 - tot0) / tot0 * 100:+.1f}%)")
    n_f = sum(1 for r in rows if r[6])
    print(f"fenced movers (>20% and outside spread): {n_f}")
    for n, a, b, d, pct, spread, fenced in rows:
        if fenced:
            print(f"  FENCE {n}: {a:.3f} -> {b:.3f} ({pct:+.1f}%, spread {spread:.3f})")


if __name__ == "__main__":
    main()

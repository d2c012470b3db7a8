"""Drift-immune round-over-round bench triage (VERDICT r12 "Next
round" #2).

This box swings ±15-30% on byte-identical code (r12: three full
identical-code runs read 1.13× / 1.29× / 1.44× on the same 154-query
set within one session, producing 80 false >1.3× flags). A raw
per-query ratio therefore measures the HOST as much as the plan. From
r13 on, bench.py interleaves five fixed plan-family-diverse canaries
through the suite; this tool normalizes every per-query ratio by the
canary-level ratio between the two runs before flagging, so a
surviving flag means a PLAN regressed relative to the same-host
baseline — no multi-run adjudication essay needed.

Usage: python tools/bench_compare.py PREV.json CUR.json [threshold]

- canary_ratio = cur.canary.median_level / prev.canary.median_level
  (1.0 when either artifact predates the canary field — raw triage,
  flagged as such in the output).
- normalized ratio(q) = (cur[q] / prev[q]) / canary_ratio; flags are
  normalized ratios above the threshold (default 1.3) on queries
  above 1 s in the current run (sub-second walls are scheduling
  noise at any normalization).

Prints a JSON summary: common-set totals (raw + normalized), the
canary ratio, and the surviving flag list with raw vs normalized
ratios side by side.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    prev = json.load(open(sys.argv[1]))
    cur = json.load(open(sys.argv[2]))
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3

    pq, cq = prev["queries"], cur["queries"]
    common = sorted(set(pq) & set(cq))
    prev_total = sum(pq[n] for n in common)
    cur_total = sum(cq[n] for n in common)

    # Normalize only when BOTH artifacts carry a canary level sampled
    # over the SAME canary set (r13 review): a short or interrupted run
    # that sampled a subset yields a median_level summed over different
    # queries — structurally incomparable, so fall back to raw triage
    # (labelled) instead of silently skewing every normalized ratio.
    # Explicit None checks — a 0.0 level is 'broken sample', also raw.
    pcan, ccan = prev.get("canary", {}), cur.get("canary", {})
    pc, cc = pcan.get("median_level"), ccan.get("median_level")
    pkeys = sorted(pcan.get("samples", {}))
    ckeys = sorted(ccan.get("samples", {}))
    comparable = (
        pc is not None and cc is not None and pc > 0 and cc > 0
        and pkeys == ckeys and pkeys
    )
    canary_ratio = (cc / pc) if comparable else 1.0

    flags = {}
    for n in common:
        if cq[n] < 1.0 or pq[n] <= 0:
            continue
        raw = cq[n] / pq[n]
        norm = raw / canary_ratio
        if norm > threshold:
            flags[n] = {
                "prev_s": pq[n],
                "cur_s": cq[n],
                "raw_ratio": round(raw, 3),
                "normalized_ratio": round(norm, 3),
            }

    out = {
        "common_queries": len(common),
        "prev_total_s": round(prev_total, 1),
        "cur_total_s": round(cur_total, 1),
        "raw_total_ratio": round(cur_total / prev_total, 3),
        "canary_ratio": round(canary_ratio, 3)
        if comparable
        else "unavailable (raw triage)",
        "normalized_total_ratio": round(
            cur_total / prev_total / canary_ratio, 3
        ),
        "threshold": threshold,
        "flags": dict(
            sorted(
                flags.items(),
                key=lambda kv: kv[1]["normalized_ratio"],
                reverse=True,
            )
        ),
        "n_flags": len(flags),
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

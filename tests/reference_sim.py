"""Pure-Python simulator of the reference's bucket algebra — the in-test
oracle for golden parity.

Re-implements, from the structural survey (SURVEY.md §2.3), exactly what the
coprocessor computes:

- bucket list: do-while from t_min stepping by interval, appending the next
  range BEFORE testing `next.max <= t_max`, so one trailing bucket past
  t_max is always emitted (TimeseriesAggregateImplementation.java:78-111).
- key mode: every cell in the scan is probed against the bucket list
  ([min, max) membership — Max.java:26-28); cells outside all buckets drop.
- scanner mode: the scanner filters cells to [t_min, t_max) first, so
  trailing buckets stay empty and therefore absent (README.md:29 discrepancy:
  9 vs 8 buckets on the same logical range).
- empty buckets never appear (Max.java:29-34); avg divides to float
  (TimeseriesAggregationClient.java:547-557); count counts cells.
"""

from __future__ import annotations


def bucket_list_ms(t_min_s: int, t_max_s: int, interval_s: int) -> list[tuple[int, int]]:
    """The reference's do-while bucket generation, in millis."""
    lo, hi, ival = t_min_s * 1000, t_max_s * 1000, interval_s * 1000
    ranges = [(lo, lo + ival)]
    while True:
        nxt = (ranges[-1][1], ranges[-1][1] + ival)
        ranges.append(nxt)
        if nxt[1] > hi:
            break
    return ranges


def aggregate(
    cells: list[tuple[int, int]],
    verb: str,
    t_min_s: int,
    t_max_s: int,
    interval_s: int,
    mode: str = "key",
) -> dict[int, float | int]:
    """{bucket_start_ms → aggregate} exactly as the reference computes it."""
    ranges = bucket_list_ms(t_min_s, t_max_s, interval_s)
    if mode == "scanner":
        cells = [c for c in cells if t_min_s <= c[0] < t_max_s]
    acc: dict[int, list[int]] = {}
    for ts_s, value in cells:
        ts_ms = ts_s * 1000
        for lo, hi in ranges:  # linear probe, ≤1 match (tumbling)
            if lo <= ts_ms < hi:
                acc.setdefault(lo, []).append(value)
                break
    out: dict[int, float | int] = {}
    for lo, vals in sorted(acc.items()):
        if verb == "max":
            out[lo] = max(vals)
        elif verb == "min":
            out[lo] = min(vals)
        elif verb == "sum":
            out[lo] = sum(vals)
        elif verb == "avg":
            out[lo] = sum(vals) / len(vals)
        elif verb == "count":
            out[lo] = len(vals)
        else:
            raise ValueError(verb)
    return out

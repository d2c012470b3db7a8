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


def lttb_reference(
    points: list[tuple[int, float, int]], n_out: int
) -> list[tuple[int, float, int]]:
    """Pinned pure-Python LTTB (Steinarsson 2013) — the in-CI oracle for
    the ``ts_lttb_downsample_50`` catalog query, whose backward-sequential
    pick has no SQL restatement. Implements the operator's documented
    determinism contract from scratch: points sorted by (ts_us, tiebreak),
    y in exact cents (double → shortest-decimal string → HALF_UP cents,
    the Java ``BigDecimal.valueOf`` path Spark's DECIMAL(18,2) cast
    takes), doubled-triangle areas as exact integer cross products with
    the next bucket's centroid multiplied through by its size (no float
    anywhere), strict > so ties keep the earliest point.

    ``points``: (ts_us, value, tiebreak); returns the selected points in
    time order.
    """
    import decimal

    pts = sorted(points, key=lambda p: (p[0], p[2]))
    n = len(pts)
    if n <= n_out:
        return pts

    def cents(v: float) -> int:
        return int(
            decimal.Decimal(repr(v)).quantize(
                decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP
            )
            * 100
        )

    xs = [p[0] for p in pts]
    ys = [cents(p[1]) for p in pts]
    interior, nb = n - 2, n_out - 2
    bounds = [1 + (interior * b) // nb for b in range(nb + 1)]
    idx = [0]
    prev = 0
    for b in range(nb):
        lo, hi = bounds[b], bounds[b + 1]
        nlo, nhi = (bounds[b + 1], bounds[b + 2]) if b + 1 < nb else (n - 1, n)
        m = nhi - nlo
        csx, csy = sum(xs[nlo:nhi]), sum(ys[nlo:nhi])
        ax, ay = xs[prev], ys[prev]
        best, best_area = lo, -1
        for i in range(lo, hi):
            bx, by = xs[i], ys[i]
            area = abs((ax * m - csx) * (by - ay) - (ax - bx) * (csy - ay * m))
            if area > best_area:
                best, best_area = i, area
        idx.append(best)
        prev = best
    idx.append(n - 1)
    return [pts[i] for i in idx]


def repeated_substring_reference(
    docs: list[tuple[int, str]], k: int
) -> dict[int, tuple[str, int, int]]:
    """Pure-Python reference for
    ``text.dedup_repeated_substrings`` (Lee et al. arXiv:2107.06499
    cover semantics): lowercased whitespace tokens, positional k-gram
    occurrences compared by CONTENT (no hashing — the md5 fingerprint in
    the operator stands in for exact window equality), lexicographic
    (doc, p) first occurrence kept, every other occurrence's [p, p+k-1]
    window removed. Returns {doc_id: (text_clean, n_tokens, n_removed)}.
    """
    import re
    from collections import defaultdict

    toks = {d: re.split(r"\s+", t.strip().lower()) for d, t in docs}
    by: dict[tuple, list[tuple[int, int]]] = defaultdict(list)
    for d, tk in toks.items():
        for p in range(1, len(tk) - k + 2):
            by[tuple(tk[p - 1 : p - 1 + k])].append((d, p))
    covered: dict[int, set[int]] = defaultdict(set)
    for lst in by.values():
        if len(lst) >= 2:
            first = min(lst)
            for d, p in lst:
                if (d, p) != first:
                    covered[d].update(range(p, p + k))
    out = {}
    for d, tk in toks.items():
        kept = [t for i, t in enumerate(tk, 1) if i not in covered[d]]
        out[d] = (" ".join(kept), len(tk), len(tk) - len(kept))
    return out

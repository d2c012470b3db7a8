"""Round-11 amortization census for the persisted IVF index: what the
standing index buys per query batch at sf1 (20k vectors, nlist=256).

The in-memory :func:`ivf_topk` re-assigns the CORPUS on every call —
the right shape for one-shot retrieval, the wrong one for a standing
deployment answering query batches against a fixed corpus. The
persisted index (`write_ivf_index` → cent_id-partitioned parquet)
moves that work to build time; `ivf_topk_indexed` then pays only the
query-side probe assignment plus a dynamic-partition-pruned scan of
the probed cell directories.

Recorded, all min-of-3 after an untimed warmup:

- ``build_wall_s``          — one-time index build (assign + write);
- ``query_indexed_wall_s``  — a 100-query top-5 batch via the index;
- ``query_inmemory_wall_s`` — the same batch via ivf_topk (corpus
                              re-assigned inside the call);
- ``probed_cell_fraction``  — distinct probed cells / non-empty cells
                              (the fraction of index DIRECTORIES the
                              pruned scan touches);
- ``breakeven_batches``     — build_wall / (inmemory − indexed): how
                              many query batches until the build has
                              paid for itself (∞ if indexed is not
                              faster at this fixture — honesty over
                              advocacy; at fixture scale scheduling
                              floors can hide the assignment saving).

Writes tools/bench_index_r11.json.
Usage: python tools/bench_index_r11.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = f"{REPO}/.benchdata/sf1"
OUT = f"{REPO}/tools/bench_index_r11.json"
NLIST, NPROBE, K, NQ = 256, 8, 5, 100


def _min3(fn):
    walls = []
    for _ in range(3):
        t0 = time.time()
        fn()
        walls.append(round(time.time() - t0, 2))
    return min(walls), walls


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    import tempfile

    from pyspark.sql import functions as F

    from hbase_taggregator_spark.operators import similarity as S
    from hbase_taggregator_spark.session import get_spark

    spark = get_spark(app_name="bench-index-r11")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF1}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    cents = (
        emb.orderBy("vec_id").limit(NLIST)
        .select(F.col("vec_id").alias("cent_id"),
                F.col("embedding").alias("cvec"))
    )
    q = emb.filter(F.col("vec_id") < NQ)

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/ivf"
        # untimed warmup build, then timed rebuilds (overwrite mode)
        S.write_ivf_index(emb, cents, path)
        build_wall, bw = _min3(lambda: S.write_ivf_index(emb, cents, path))
        idx = S.read_ivf_index(spark, path)
        cells = idx.select("cent_id").distinct().count()

        result = {
            "sf1_vectors": n,
            "nlist": NLIST, "k": K,
            "build_wall_s": build_wall,
            "walls_raw_build": bw,
            "batches": {},
            "note": "the WALL comparison at 20k rows is honest but"
            " fixture-bound both ways: the in-memory path's corpus"
            " assignment is ~1 s of Arrow matmul here (at 100 TB it is a"
            " full data pass per batch), while the indexed path pays a"
            " 256-directory listing floor (at 100 TB each cell is many"
            " large files and that floor vanishes into the scan). The"
            " quantity that scales is rows_read: the pruned scan reads"
            " probed cells only — measured below per operating point —"
            " where the in-memory path reads AND re-assigns all N every"
            " batch. dynamic partition pruning is plan-asserted in"
            " tests/test_round11.py.",
        }
        for label, nq, nprobe in (
            ("selective_batch", 10, 4),
            ("saturating_batch", NQ, NPROBE),
        ):
            qb = emb.filter(F.col("vec_id") < nq)
            # warmups
            S.ivf_topk_indexed(idx, qb, cents, k=K, n_probe=nprobe
                               ).write.format("noop").mode("overwrite").save()
            S.ivf_topk(emb, qb, k=K, n_probe=nprobe, centroids=cents
                       ).write.format("noop").mode("overwrite").save()
            wall_idx, wi = _min3(
                lambda: S.ivf_topk_indexed(
                    idx, qb, cents, k=K, n_probe=nprobe
                ).write.format("noop").mode("overwrite").save()
            )
            wall_mem, wm = _min3(
                lambda: S.ivf_topk(
                    emb, qb, k=K, n_probe=nprobe, centroids=cents
                ).write.format("noop").mode("overwrite").save()
            )
            probed = S.ivf_assign(
                qb.select(F.col("vec_id").alias("query_id"), "embedding"),
                cents, "embedding", "query_id", n_probe=nprobe,
            ).select("cent_id").distinct()
            n_probed = probed.count()
            rows_read = idx.join(F.broadcast(probed), "cent_id").count()
            saved = wall_mem - wall_idx
            result["batches"][label] = {
                "n_queries": nq, "n_probe": nprobe,
                "query_indexed_wall_s": wall_idx,
                "query_inmemory_wall_s": wall_mem,
                "walls_raw": {"indexed": wi, "inmemory": wm},
                "probed_cells": n_probed,
                "nonempty_cells": cells,
                "probed_cell_fraction": round(n_probed / cells, 4),
                "rows_read_indexed": rows_read,
                "rows_read_fraction": round(rows_read / n, 4),
                "rows_read_and_assigned_inmemory": n,
                "breakeven_batches": (
                    round(build_wall / saved, 1) if saved > 0 else None
                ),
            }
            print(json.dumps({label: result["batches"][label]}), flush=True)

    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

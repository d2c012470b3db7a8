"""Round-13 census: the beyond-broadcast ``write_ivf_index(strategy=
"twolevel")`` build path, with evidence (VERDICT r12 "Next round" #7).

The twolevel strategy exists so index BUILDS keep working when the
cell-capped ``nlist ∝ N`` sizing pushes the centroid set past what a
driver collect / broadcast should carry — assignment runs against a
distributed centroid frame end-to-end (only the ≈ √nlist super set is
ever collected). Until now it was a pass-through with no census of an
actual beyond-broadcast-scale index build + pruned probe. This census
builds at nlist=10⁴ over the 20k-vector sf1 corpus and records:

- ``build_wall_s``            — twolevel build (n_super=100,
                                n_super_probe=4) vs the flat/arrow
                                build at the same nlist;
- ``cells_written``           — distinct cent_id directories;
- ``probe_wall_s``            — ivf_topk_indexed, 10 queries ×
                                n_probe=4 off the standing layout;
- ``probed_cells`` / ``probed_bytes`` vs totals — the partition-
                                pruning payoff at real dials: ≤ 40 of
                                10⁴ cell directories eligible.

The correctness side is pinned in tests/test_round13.py: at
guaranteeing settings (n_super_probe = n_super, every super-cell
probed) the twolevel-built index is row-identical to the flat-built
one, and the served top-k off both layouts matches.

Writes tools/bench_twolevel_build_r13.json.
Usage: python tools/bench_twolevel_build_r13.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = f"{REPO}/.benchdata/sf1"
OUT = f"{REPO}/tools/bench_twolevel_build_r13.json"
NLIST = 10_000
N_SUPER, N_SUPER_PROBE = 100, 4
N_PROBE, K, NQ = 4, 5, 10


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from hbase_taggregator_spark.operators import similarity as S
    from hbase_taggregator_spark.session import get_spark

    spark = get_spark(app_name="bench-twolevel-r13")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF1}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    # nlist=10^4 centroids as a DISTRIBUTED frame — the twolevel build
    # never collects it (that's the point); the flat comparison build
    # routes through the arrow strategy's SparkContext.broadcast
    cents = (
        emb.orderBy("vec_id")
        .limit(NLIST)
        .select(
            F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
        )
    )
    queries = emb.orderBy("vec_id").limit(NQ)

    result: dict = {
        "corpus_vectors": emb.count(),
        "nlist": NLIST,
        "n_super": N_SUPER,
        "n_super_probe": N_SUPER_PROBE,
        "n_probe": N_PROBE,
        "n_queries": NQ,
    }

    with tempfile.TemporaryDirectory() as d:
        t0 = time.time()
        S.write_ivf_index(
            emb, cents, f"{d}/tl", strategy="twolevel",
            n_super=N_SUPER, n_super_probe=N_SUPER_PROBE,
        )
        result["twolevel_build_wall_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        S.write_ivf_index(emb, cents, f"{d}/flat")
        result["flat_arrow_build_wall_s"] = round(time.time() - t0, 2)

        idx = S.read_ivf_index(spark, f"{d}/tl")
        cells = [
            e for e in os.listdir(f"{d}/tl") if e.startswith("cent_id=")
        ]
        result["cells_written"] = len(cells)
        result["index_bytes_total"] = _dir_bytes(f"{d}/tl")

        probes = S.ivf_assign(
            queries.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("__qvec"),
            ),
            cents, "__qvec", "query_id", n_probe=N_PROBE,
        ).select("cent_id").distinct()
        probed = [int(r["cent_id"]) for r in probes.collect()]
        result["probed_cells"] = len(probed)
        result["probed_cells_fraction"] = round(len(probed) / len(cells), 5)
        result["probed_bytes"] = sum(
            _dir_bytes(f"{d}/tl/cent_id={c}") for c in probed
        )
        result["probed_bytes_fraction"] = round(
            result["probed_bytes"] / max(result["index_bytes_total"], 1), 5
        )

        def probe():
            S.ivf_topk_indexed(
                idx, queries, cents, k=K, n_probe=N_PROBE
            ).write.format("noop").mode("overwrite").save()

        probe()
        walls = []
        for _ in range(2):
            t0 = time.time()
            probe()
            walls.append(round(time.time() - t0, 2))
        result["probe_wall_s"] = min(walls)
        result["probe_walls_raw"] = walls

    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()

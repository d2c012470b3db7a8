"""Round-16 microbench: isolate the two-level candidate-scoring cost.

The two-level assignment's step-4 join scores N x n_super_probe x cell
candidate pairs with the exact-decimal cosine (dot() = zip_with +
decimal-accumulate, interpreted per row). The r15 round deferred a
two-phase double/decimal argmin for this path; before building it,
measure what each scoring algebra costs on the REAL candidate join
shape (probes x members at the gate dials over the sf0.1 embeddings):

  - exact    : dot() decimal HOF (current production scoring)
  - dfast    : _ddot() plain-double HOF (CodegenFallback, interpreted)
  - dunroll  : width-64 unrolled plain-double chain (codegen-resident),
               guarded to fall back to _ddot on ragged rows
  - constant : F.lit(0.0) distance — the join+agg floor

Each variant runs the SAME n_probe=1 argmin aggregation so the numbers
are end-to-end comparable. min-of-3, noop sink.

Usage: python tools/bench_twolevel_scoring_r16.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from hbase_taggregator_spark.queries import QUERIES, load_table  # noqa: E402
from hbase_taggregator_spark.oracle_fragments import (  # noqa: E402
    TWOLEVEL_NLIST,
    TWOLEVEL_NSUPER,
    TWOLEVEL_NPROBE,
)
from hbase_taggregator_spark.session import get_spark  # noqa: E402
from hbase_taggregator_spark.util import ensure_parallelism  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="bench-twolevel-scoring-r16",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from hbase_taggregator_spark.operators.similarity import (
        _ddot,
        _nz,
        dot,
        two_level_parts,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < TWOLEVEL_NLIST).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )
    members, probes = two_level_parts(
        ensure_parallelism(emb), cents,
        n_super=TWOLEVEL_NSUPER, n_super_probe=TWOLEVEL_NPROBE,
    )
    cand = probes.join(members, "__sid")
    n_cand = cand.count()
    print(f"candidate rows: {n_cand}")

    def unrolled_ddot(a, b, width=64):
        acc = F.lit(0.0)
        for j in range(width):
            acc = acc + F.get(a, j).cast("double") * F.get(b, j)
        return F.when(
            (F.size(a) == width) & (F.size(b) == width), acc
        ).otherwise(_ddot(a, b))

    variants = {
        "exact_decimal": lambda: dot(F.col("embedding"), F.col("__cv")),
        "double_hof": lambda: _ddot(F.col("embedding"), F.col("__cv")),
        "double_unroll": lambda: unrolled_ddot(
            F.col("embedding"), F.col("__cv")
        ),
        "constant": lambda: F.lit(0.0),
    }

    results = {}
    for name, mk in variants.items():
        scored = cand.select(
            "vec_id",
            F.struct(
                (-(mk() / _nz(F.col("nrm") * F.col("__cnrm")))).alias("n"),
                F.col("__cid").alias("c"),
            ).alias("__e"),
        )
        best = scored.groupBy("vec_id").agg(F.min("__e").alias("__b")).select(
            "vec_id", F.col("__b")["c"].alias("cent_id")
        )
        walls = []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"score:{name}")
            t0 = time.time()
            best.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        results[name] = min(walls)
        print(f"{name:15s} min={min(walls):6.3f}s runs={walls}", flush=True)

    # value identity: double_unroll must equal double_hof bit-for-bit
    mism = (
        cand.select(
            _ddot(F.col("embedding"), F.col("__cv")).alias("a"),
            unrolled_ddot(F.col("embedding"), F.col("__cv")).alias("b"),
        )
        .filter("a IS DISTINCT FROM b")
        .count()
    )
    print(f"unroll-vs-hof mismatches: {mism}")
    results["unroll_mismatches"] = mism
    results["candidate_rows"] = n_cand

    out = os.path.join(REPO, "tools", "bench_twolevel_scoring_r16.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()

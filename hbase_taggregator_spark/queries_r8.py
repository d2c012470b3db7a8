"""Round-8 catalog queries.

The headline entry gates the round's scale fix (VERDICT r7 "Next
round" #1): two-level coarse-quantized IVF assignment
(``operators.similarity.ivf_assign_two_level``) — nearest-centroid
assignment that NEVER materializes the centroid set on the driver, in a
plan literal, in a task closure, or in a broadcast. The flat strategies
now ship centroids via ``SparkContext.broadcast`` (torrent, once per
executor), which holds to roughly ``TWO_LEVEL_MIN_NLIST``; past that,
the cell-capped ``nlist ∝ N`` SemDeDup sizing needs assignment whose
memory footprint is independent of nlist — vectors meet centroids
through an equi-join on a coarse super-cell key instead.

The gate runs the full two-level algebra at fixture scale (nlist=64,
n_super=8, n_super_probe=4) and the oracle restates EVERY step in
DuckDB: the rank-order block slicing, the decimal-exact per-dimension
super-centroid means, both nearest-super argmins (centroid membership
and vector probing), the super-cell candidate join, and the final
exact-cosine argmin — so the approximation is pinned, deterministic,
and hash-gated, not just rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hbase_taggregator_spark.oracle_fragments import (
    _SQL_E,
    TWOLEVEL_NLIST,
    TWOLEVEL_NPROBE,
    TWOLEVEL_NSUPER,
    TWOLEVEL_SQL_CTES,
)
from hbase_taggregator_spark.queries import _register, load_table


def _q_twolevel_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level IVF assignment over the embeddings table: centroids =
    first TWOLEVEL_NLIST corpus vectors (the catalog's deterministic
    init), output (vec_id, cent_id) per corpus vector. See
    :func:`hbase_taggregator_spark.operators.similarity.
    ivf_assign_two_level` for the 100 TB design."""
    from hbase_taggregator_spark.operators.similarity import (
        ivf_assign_two_level,
    )
    from hbase_taggregator_spark.util import ensure_parallelism

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < TWOLEVEL_NLIST).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )
    return (
        ivf_assign_two_level(
            ensure_parallelism(emb),
            cents,
            n_super=TWOLEVEL_NSUPER,
            n_super_probe=TWOLEVEL_NPROBE,
        )
        .select("vec_id", "cent_id")
        .orderBy("vec_id")
    )


_register(
    "similarity_twolevel_assign",
    _q_twolevel_assign,
    f"""
    WITH {_SQL_E},
    {TWOLEVEL_SQL_CTES}
    SELECT vec_id, cid AS cent_id FROM (
        SELECT cdot.vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY cdot.vec_id
                                  ORDER BY d / (nv.nrm * nc.nrm) DESC,
                                           cid) AS rk
        FROM cdot JOIN norms nv ON nv.vec_id = cdot.vec_id
                  JOIN norms nc ON nc.vec_id = cid)
    WHERE rk = 1 ORDER BY vec_id
    """,
)


def _q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle population covariance of the embedding table —
    one corpus pass, map-side outer products, partial aggregation to
    dim(dim+1)/2 cells before the single shuffle. The oracle restates
    the identical decimal-sum + pinned-IEEE-order algebra."""
    from hbase_taggregator_spark.operators.similarity import (
        embedding_covariance,
    )
    from hbase_taggregator_spark.util import ensure_parallelism

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_covariance(ensure_parallelism(emb)).orderBy("i", "j")


_register(
    "embedding_covariance_matrix",
    _q_embedding_covariance,
    """
    -- products route through VARCHAR before the decimal cast: DuckDB's
    -- double->VARCHAR is shortest-repr and VARCHAR->DECIMAL rounds
    -- HALF_UP, which is EXACTLY Spark's double->decimal path
    -- (BigDecimal.valueOf + setScale HALF_UP). Casting the raw double
    -- instead rounds its exact binary expansion — with ~1M products per
    -- matrix and catastrophic cancellation in (sxy - sx*sy/n), the
    -- handful of shortest-repr/exact-value midpoint straddles showed up
    -- as 1-ulp hash mismatches.
    WITH e AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
               FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i)
               WHERE len(embedding) = 64),
    lin AS (SELECT i,
                   CAST(SUM(CAST(CAST(v AS VARCHAR) AS DECIMAL(28,12)))
                     AS DOUBLE) AS sx,
                   COUNT(*) AS n
            FROM e GROUP BY 1),
    quad AS (SELECT a.i AS i, b.i AS j,
                    CAST(SUM(CAST(CAST(a.v * b.v AS VARCHAR)
                                  AS DECIMAL(28,12))) AS DOUBLE) AS sxy
             FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.i >= a.i
             GROUP BY 1, 2)
    SELECT q.i, q.j,
           (sxy - (la.sx * lb.sx) / CAST(la.n AS DOUBLE))
             / CAST(la.n AS DOUBLE) AS cov
    FROM quad q JOIN lin la ON la.i = q.i JOIN lin lb ON lb.i = q.j
    ORDER BY q.i, q.j
    """,
)


def _q_embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization with integer per-vector
    summaries (quantize_int8's checksum discipline) — the whitening-prep
    companion to the covariance gate; two shuffle-light passes."""
    from hbase_taggregator_spark.operators.similarity import (
        embedding_standardize,
    )
    from hbase_taggregator_spark.util import ensure_parallelism

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_standardize(ensure_parallelism(emb)).orderBy("vec_id")


_register(
    "embedding_standardize_checksums",
    _q_embedding_standardize,
    """
    -- moment sums route the decimal casts through VARCHAR (shortest-repr
    -- HALF_UP = Spark's BigDecimal.valueOf path; see the covariance
    -- oracle note); SUM(BIGINT) is HUGEINT in DuckDB, so the integer
    -- summaries cast back to BIGINT for the type-tagged hasher
    WITH e AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
               FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i)
               WHERE len(embedding) = 64),
    st AS (SELECT i,
                  CAST(SUM(CAST(CAST(v AS VARCHAR) AS DECIMAL(28,12)))
                    AS DOUBLE) AS sx,
                  CAST(SUM(CAST(CAST(v * v AS VARCHAR) AS DECIMAL(28,12)))
                    AS DOUBLE) AS sxx,
                  COUNT(*) AS n
           FROM e GROUP BY 1),
    -- greatest(·, 0) before the sqrt mirrors the Spark side's clamp: on
    -- a constant dimension decimal rounding can push the variance a hair
    -- negative, and sqrt(negative) is NaN (r8 ADVICE)
    ms AS (SELECT i, sx / CAST(n AS DOUBLE) AS mean,
                  sqrt(greatest((sxx - (sx * sx) / CAST(n AS DOUBLE))
                                / CAST(n AS DOUBLE), 0.0)) AS std
           FROM st),
    zq AS (SELECT e.vec_id, e.i,
                  CAST(FLOOR((CASE WHEN std > 0
                                   THEN (v - mean) / std
                                   ELSE 0.0 END) * 1000.0 + 0.5)
                    AS BIGINT) AS q
           FROM e JOIN ms ON ms.i = e.i)
    SELECT vec_id, COUNT(*) AS n_dims,
           CAST(SUM(ABS(q)) AS BIGINT) AS z_l1,
           CAST(SUM(q * i) AS BIGINT) AS z_checksum
    FROM zq GROUP BY 1 ORDER BY vec_id
    """,
)


# re-apply the gate-window ordering now that round-8 queries are
# registered (tolerant on every import path, same as queries_r3..r7 —
# whichever module finishes last sees the full catalog).
from hbase_taggregator_spark.queries_ext import _apply_gate_window  # noqa: E402

_apply_gate_window(strict=False)

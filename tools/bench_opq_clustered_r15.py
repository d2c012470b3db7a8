"""OPQ-style rotation censused on the clustered regime (VERDICT r14
"Next round" #3 — the deferred r13 stretch, now run where there is
contrast to harvest).

Two deterministic fixtures, both pure Spark expressions (no RNG):

- ``isotropic``: the r14 16-cluster fixture
  (tools/bench_pq_residual_clustered_r14.py) — within-cluster noise
  amplitude CONSTANT across dims. Its residual covariance is near
  white, so PCA has nothing to reorder: the honest expectation is a
  no-win for rotation, and the census documents it.
- ``skewed``: same clusters, noise amplitude decaying 2^(-i/8) with
  dimension — axis-aligned anisotropy. (Measured outcome: the decay
  CONCENTRATES the discriminative energy into the first dims, which
  the floor dials' 256-codeword subspace books already describe
  near-exactly — every variant saturates at recall ~1.0, so this
  fixture documents that axis-aligned skew alone is NOT the rotation
  regime at a generous bit budget.)
- ``lowrank``: the textbook OPQ win regime — within-cluster offsets
  are a RANK-8 mixture, each component a fixed direction SPREAD ACROSS
  ALL 64 DIMS (sin((t+1)(i+1)·0.37) profiles). Natural contiguous
  chunking hands every subspace an entangled projection of all eight
  directions; OPQ's PCA + eigenvalue allocation aligns the eight
  directions with subspaces so each codebook quantizes one clean
  factor. Censused at a TIGHT budget (m=8 × 16 codes = 32-bit codes)
  where the entanglement actually costs bits — at the floor budget
  (128 bits for 2,000 vectors) every book is underfilled and no
  rotation can matter.

Each fixture runs {raw, raw+OPQ, residual, residual+OPQ} × {no rerank,
FIXED rerank_k=20} at its dials. Rotation for the residual points is
trained on the RESIDUAL distribution (the paper's IVF+OPQ form);
because R is orthogonal it commutes with the cell-mean subtract
(R(x−μ) = Rx − Rμ), so "rotate the corpus once at ingest, run the
unchanged residual stack" IS the OPQ-IVFADC construction — exact
distances are rotation-invariant, only the code-bit allocation moves.

Writes tools/bench_opq_clustered_r15.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from hbase_taggregator_spark.operators import similarity as S  # noqa: E402
from hbase_taggregator_spark.session import get_spark  # noqa: E402

DIM, NLIST, N = 64, 16, 2000
FLOOR_M, FLOOR_CODES, NPROBE, K = 16, 256, 4, 5


def clustered_corpus(spark, n=N, dim=DIM, nlist=NLIST, noise=0.05,
                     skew=False):
    """The r14 deterministic clustered fixture; ``skew=True`` decays
    the within-cluster noise amplitude 2^(-i/8) with dimension."""
    c = (F.col("id") % nlist + 1).cast("double")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.sin(c * (i + 1))
            + (F.lit(noise) * F.pow(F.lit(2.0),
                                    -i.cast("double") / F.lit(8.0))
               if skew else F.lit(noise))
            * F.sin((F.col("id") + 1) * (i + 1) * 7.13)
        ).cast("double"),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )


def lowrank_corpus(spark, n=N, dim=DIM, nlist=NLIST, rank=8, amp=0.12):
    """Clusters + RANK-``rank`` correlated within-cluster offsets:
    factor t's loading on vec_id is sin((vec_id+1)(t+3)·1.7), its
    direction profile over dims is sin((t+1)(i+1)·0.37) — every factor
    touches every dim, so contiguous chunks see entangled mixtures
    until a rotation aligns factors with subspaces. Deterministic."""
    c = (F.col("id") % nlist + 1).cast("double")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.sin(c * (i + 1))
            + sum(
                (F.lit(amp)
                 * F.sin((F.col("id") + 1) * (t + 3) * 1.7)
                 * F.sin((t + 1) * (i + 1) * 0.37))
                for t in range(rank)
            )
        ).cast("double"),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )


def main() -> int:
    spark = get_spark(
        app_name="opq-clustered", master="local[16]",
        shuffle_partitions=16,
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "dials": {
            "isotropic": {"m": FLOOR_M, "n_codes": FLOOR_CODES,
                          "nlist": NLIST, "n_probe": NPROBE,
                          "refine_iters": 1, "k": K},
            "skewed": {"m": FLOOR_M, "n_codes": FLOOR_CODES,
                       "nlist": NLIST, "n_probe": NPROBE,
                       "refine_iters": 1, "k": K},
            "lowrank": {"m": 8, "n_codes": 16, "nlist": NLIST,
                        "n_probe": NPROBE, "refine_iters": 1, "k": K},
        },
        "fixtures": {},
    }
    fixtures = [
        ("isotropic", clustered_corpus(spark, skew=False)),
        ("skewed", clustered_corpus(spark, skew=True)),
        ("lowrank", lowrank_corpus(spark)),
    ]
    for fname, emb in fixtures:
        m_d = out["dials"][fname]["m"]
        codes_d = out["dials"][fname]["n_codes"]
        q_raw = emb.filter(F.col("vec_id") < 10)
        exact = {
            (r["query_id"], r["vec_id"])
            for r in S.l2_topk(emb, q_raw, k=K).collect()
        }

        def recall(df):
            got = {
                (r["query_id"], r["vec_id"])
                for r in df.select("query_id", "vec_id").collect()
            }
            return round(len(got & exact) / len(exact), 3)

        # rotations: raw points train on the centered corpus, residual
        # points on the residual distribution (cell means of the
        # first-NLIST-seeded assignment — the same cells ivf_pq_topk
        # builds internally)
        cents = emb.orderBy("vec_id").limit(NLIST).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cvec"),
        )
        assigned = S.ivf_assign(emb, cents, n_probe=1)
        means = S._cell_mean_centroids(assigned, "embedding")
        resid = S._ivf_residuals(assigned, means, "embedding").select(
            "vec_id", F.col("__rvec").alias("embedding")
        )
        r_raw = S.opq_rotation(emb, m=m_d, dim=DIM)
        r_res = S.opq_rotation(resid, m=m_d, dim=DIM)
        rot_for = {
            False: S.apply_rotation(emb, r_raw),
            True: S.apply_rotation(emb, r_res),
        }

        fx = {}
        for residual in (False, True):
            for opq in (False, True):
                corpus = rot_for[residual] if opq else emb
                queries = corpus.filter(F.col("vec_id") < 10)
                for rerank_k in (None, 20):
                    t0 = time.time()
                    df = S.ivf_pq_topk(
                        corpus, queries, k=K, m=m_d,
                        n_codes=codes_d, n_centroids=NLIST,
                        n_probe=NPROBE, refine_iters=1,
                        rerank_k=rerank_k, residual=residual,
                    )
                    name = (
                        f"{'residual' if residual else 'raw'}"
                        f"{'+opq' if opq else ''}:rerank={rerank_k or 0}"
                    )
                    fx[name] = {
                        "recall_at_5": recall(df),
                        "wall_s": round(time.time() - t0, 1),
                    }
                    print(fname, name, fx[name], flush=True)
        out["fixtures"][fname] = fx

    path = os.path.join(REPO, "tools", "bench_opq_clustered_r15.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

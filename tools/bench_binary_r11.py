"""Round-11 scale/quality census for the banded Hamming family and the
composed IVF + binary stack (VERDICT r10 "Next round" #1/#4/#6).

Three sections, all at sf1 (20k vectors = 500 base × 40 jittered
copies — the near-duplicate regime the banded index exists for):

1. ``banded_radius_census`` — the multi-index banded self-join at the
   default 4×16-bit banding, radius 3, vs the exhaustive N² cross:
   candidate pairs the banded equi-join actually materializes (distinct
   and with band multiplicity) against C(N,2), matched radius-pairs
   (identical row sets — the completeness guarantee), min-of-2 walls
   for both plans. The census quantity is the JOIN's output, the thing
   that stops scaling with N² when banding engages.

2. ``hard_recall_sweep`` — recall@5 vs ``rerank_k`` on a NON-SATURATING
   operating point (r10's artifact honestly noted the sf1 fixture
   saturates recall at 1.0 even Hamming-only, so the rerank_k dial had
   no measured curve at scale). The hard fixture applies dim-subset
   corruption in the generator's style: the same 500×40 fan-out but
   with jitter amplitude 0.12 (40× the sf1 generator's) on a
   hash-selected half of the dimensions — copies now straddle cluster
   boundaries in code space, so the Hamming shortlist genuinely loses
   neighbors that the exact re-rank must buy back. Deterministic
   (hash-derived, no RNG), regenerated in place each run.

3. ``ivf_binary_census`` — the composed stack's first-pass bound
   quantity: Σ probed-cell occupancy (the number of (query, id) code
   pairs the Hamming stage scores) vs nq·N for the flat scan, stated
   in first-pass bytes (24 B per code pair at dim=64: 2 packed words +
   id), next to recall@5 and min-of-2 walls. This is the "first-pass
   bytes = 24 B × probed occupancy, not 24 B × N" claim, measured.

Writes tools/bench_binary_r11.json.
Usage: python tools/bench_binary_r11.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = f"{REPO}/.benchdata/sf1"
HARD = f"{REPO}/.benchdata/sf1_hard"
OUT = f"{REPO}/tools/bench_binary_r11.json"
N_QUERIES = 100
K = 5


def _min2(fn):
    walls = []
    for _ in range(2):
        t0 = time.time()
        fn()
        walls.append(round(time.time() - t0, 2))
    return min(walls), walls


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    from pyspark.sql import functions as F

    from hbase_taggregator_spark.operators import similarity as S
    from hbase_taggregator_spark.session import get_spark

    spark = get_spark(app_name="bench-binary-r11")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF1}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    result: dict = {"sf1_vectors": n}

    # --- 1. banded radius census vs the exhaustive cross ------------------
    RADIUS = 3  # the 4-band guarantee radius: the near-dup operating point
    thr = S.dimension_means(emb)
    cb = S.binary_quantize(emb, thresholds=thr)

    def _exhaustive_radius():
        a = cb.select(F.col("vec_id").alias("id_a"),
                      F.col("w0").alias("a0"), F.col("w1").alias("a1"))
        b = cb.select(F.col("vec_id").alias("id_b"),
                      F.col("w0").alias("b0"), F.col("w1").alias("b1"))
        ham = (F.bit_count(F.col("a0").bitwiseXOR(F.col("b0")))
               + F.bit_count(F.col("a1").bitwiseXOR(F.col("b1")))
               ).cast("long")
        return (a.join(b, F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b", ham.alias("hamming"))
                .filter(F.col("hamming") <= RADIUS))

    banded = S.binary_hamming_radius_pairs(
        emb, radius=RADIUS, band_bits=16, thresholds=thr
    )
    n_pairs_banded = banded.count()
    n_pairs_exhaustive = _exhaustive_radius().count()
    assert n_pairs_banded == n_pairs_exhaustive, "completeness violated"

    # the bound quantity: what the banded join materializes
    ce = S._explode_bands(cb, 4, 16, "w")
    a = ce.select(F.col("vec_id").alias("id_a"), "__bidx", "__bval")
    b = ce.select(F.col("vec_id").alias("id_b"),
                  F.col("__bidx").alias("__jbidx"),
                  F.col("__bval").alias("__jbval"))
    matched = a.join(
        b,
        (F.col("__bidx") == F.col("__jbidx"))
        & (F.col("__bval") == F.col("__jbval"))
        & (F.col("id_a") < F.col("id_b")),
    )
    matched_rows = matched.count()
    distinct_cands = matched.select("id_a", "id_b").distinct().count()

    wall_banded, wb = _min2(
        lambda: S.binary_hamming_radius_pairs(
            emb, radius=RADIUS, band_bits=16, thresholds=thr
        ).write.format("noop").mode("overwrite").save()
    )
    wall_exhaustive, we = _min2(
        lambda: _exhaustive_radius()
        .write.format("noop").mode("overwrite").save()
    )
    result["banded_radius_census"] = {
        "radius": RADIUS,
        "band_bits": 16,
        "n_bands": 4,
        "pairs_within_radius": n_pairs_banded,
        "exhaustive_cross_pairs": n * (n - 1) // 2,
        "banded_matched_rows_with_multiplicity": matched_rows,
        "banded_distinct_candidate_pairs": distinct_cands,
        "candidate_cut_x": round(n * (n - 1) / 2 / max(distinct_cands, 1), 1),
        "wall_banded_s": wall_banded,
        "wall_exhaustive_scan_s": wall_exhaustive,
        "walls_raw": {"banded": wb, "exhaustive": we},
        "wall_note": "at 20k codes the 200M-pair cross is ~cheap ALU and"
        " both walls are scheduling-bound — the exhaustive scan even wins;"
        " the sf10 point below is where the pair count starts to bite and"
        " the candidate-bound banded plan crosses over",
    }
    print(json.dumps({"banded_radius_census":
                      result["banded_radius_census"]}), flush=True)

    # --- 1b. the same radius sweep one decade up (sf10, 200k codes) -------
    emb10 = spark.read.parquet(
        f"{REPO}/.benchdata/sf10/embeddings.parquet"
    ).select("vec_id", "embedding")
    n10 = emb10.count()
    thr10 = S.dimension_means(emb10)
    cb10 = S.binary_quantize(emb10, thresholds=thr10)
    cb10.persist()
    cb10.count()

    def _exhaustive10():
        a = cb10.select(F.col("vec_id").alias("id_a"),
                        F.col("w0").alias("a0"), F.col("w1").alias("a1"))
        b = cb10.select(F.col("vec_id").alias("id_b"),
                        F.col("w0").alias("b0"), F.col("w1").alias("b1"))
        ham = (F.bit_count(F.col("a0").bitwiseXOR(F.col("b0")))
               + F.bit_count(F.col("a1").bitwiseXOR(F.col("b1")))
               ).cast("long")
        return (a.join(b, F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b", ham.alias("hamming"))
                .filter(F.col("hamming") <= RADIUS))

    t0 = time.time()
    banded10 = S.binary_hamming_radius_pairs(
        emb10, radius=RADIUS, band_bits=16, thresholds=thr10
    )
    n_banded10 = banded10.count()
    wall_banded10 = round(time.time() - t0, 2)
    ce10 = S._explode_bands(cb10, 4, 16, "w")
    a10 = ce10.select(F.col("vec_id").alias("id_a"), "__bidx", "__bval")
    b10 = ce10.select(F.col("vec_id").alias("id_b"),
                      F.col("__bidx").alias("__jbidx"),
                      F.col("__bval").alias("__jbval"))
    cands10 = (
        a10.join(
            b10,
            (F.col("__bidx") == F.col("__jbidx"))
            & (F.col("__bval") == F.col("__jbval"))
            & (F.col("id_a") < F.col("id_b")),
        ).select("id_a", "id_b").distinct().count()
    )
    t0 = time.time()
    n_ex10 = _exhaustive10().count()
    wall_ex10 = round(time.time() - t0, 2)
    assert n_banded10 == n_ex10, "sf10 completeness violated"
    cb10.unpersist()
    result["banded_radius_census_sf10"] = {
        "vectors": n10,
        "radius": RADIUS,
        "pairs_within_radius": n_banded10,
        "exhaustive_cross_pairs": n10 * (n10 - 1) // 2,
        "banded_distinct_candidate_pairs": cands10,
        "candidate_cut_x": round(
            n10 * (n10 - 1) / 2 / max(cands10, 1), 1
        ),
        "wall_banded_s": wall_banded10,
        "wall_exhaustive_scan_s": wall_ex10,
        "walls_note": "single-run each (the 20e9-pair cross is minutes);"
        " both from the same persisted codes",
    }
    print(json.dumps({"banded_radius_census_sf10":
                      result["banded_radius_census_sf10"]}), flush=True)

    # --- 2. non-saturating recall@5 vs rerank_k on the hard fixture -------
    # dim-subset corruption: the sf1 generator's fan-out with jitter
    # 0.12 (vs 0.003) on the hash-selected half of dims — deterministic
    base = spark.read.parquet(
        "/root/testdata/sf0.1/embeddings.parquet"
    ).select("vec_id", "embedding")
    copies = spark.range(10).select(F.col("id").cast("int").alias("__c"))
    corrupt = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x.cast("double")
            + F.when(F.pmod(F.hash(i), F.lit(2)) == 0,
                     F.col("__c").cast("double") * 0.12
                     * (F.pmod(F.hash(F.col("vec_id"), i), F.lit(7)) - 3)
                     .cast("double")
                     ).otherwise(F.lit(0.0))
        ).cast("float"),
    )
    hard = (
        base.crossJoin(F.broadcast(copies))
        .withColumn("embedding", corrupt)
        .withColumn(
            "vec_id",
            F.col("vec_id") + F.col("__c").cast("long") * 1_000_000,
        )
        .drop("__c")
        .repartition(32)
    )
    os.makedirs(HARD, exist_ok=True)
    hard.write.mode("overwrite").parquet(f"{HARD}/embeddings.parquet")
    hard = spark.read.parquet(f"{HARD}/embeddings.parquet")
    n_hard = hard.count()
    q = hard.filter(F.col("vec_id") < N_QUERIES)
    exact = S.cosine_topk(hard, q, k=K).select("query_id", "vec_id")
    exact.persist()
    exact.count()

    sweep = []
    for rk in (5, 10, 25, 50, 100, 250):
        approx = S.binary_hamming_topk(
            hard, q, k=K, rerank_k=rk, threshold="mean"
        )
        hits = exact.join(
            approx.select("query_id", "vec_id"),
            ["query_id", "vec_id"], "left_semi",
        ).count()
        wall, _ = _min2(
            lambda rk=rk: S.binary_hamming_topk(
                hard, q, k=K, rerank_k=rk, threshold="mean"
            ).write.format("noop").mode("overwrite").save()
        )
        sweep.append({
            "rerank_k": rk,
            "mean_recall_at_5": round(hits / (N_QUERIES * K), 4),
            "wall_min2_s": wall,
        })
        print(json.dumps(sweep[-1]), flush=True)
    exact.unpersist()
    result["hard_recall_sweep"] = {
        "fixture": "sf1_hard: 2000 base x 10 copies, jitter 0.12 on the"
        " hash-selected half of dims (40x the sf1 generator amplitude) —"
        " overlapping clusters in code space",
        "vectors": n_hard,
        "n_queries": N_QUERIES,
        "k": K,
        "points": sweep,
    }

    # --- 3. IVF + binary first-pass occupancy census ----------------------
    NLIST, NPROBE, RERANK = 256, 8, 50
    cents = (
        emb.orderBy("vec_id").limit(NLIST)
        .select(F.col("vec_id").alias("cent_id"),
                F.col("embedding").alias("cvec"))
    )
    q1 = emb.filter(F.col("vec_id") < N_QUERIES)
    cells = S.ivf_assign(emb, cents, n_probe=1).select("vec_id", "cent_id")
    occ = cells.groupBy("cent_id").agg(F.count(F.lit(1)).alias("occ"))
    probes = S.ivf_assign(
        q1.select(F.col("vec_id").alias("query_id"), "embedding"),
        cents, "embedding", "query_id", n_probe=NPROBE,
    ).select("query_id", "cent_id")
    first_pass_pairs = (
        probes.join(occ, "cent_id").agg(F.sum("occ")).collect()[0][0]
    )
    exact1 = S.cosine_topk(emb, q1, k=K).select("query_id", "vec_id")
    approx1 = S.ivf_binary_topk(
        emb, q1, k=K, rerank_k=RERANK, centroids=cents, n_probe=NPROBE,
        threshold="mean",
    )
    hits1 = exact1.join(
        approx1.select("query_id", "vec_id"),
        ["query_id", "vec_id"], "left_semi",
    ).count()
    ivf_recall = S.ivf_topk(
        emb, q1, k=K, centroids=cents, n_probe=NPROBE
    ).select("query_id", "vec_id")
    hits_ivf = exact1.join(ivf_recall, ["query_id", "vec_id"],
                           "left_semi").count()
    wall_ivfb, wi = _min2(
        lambda: S.ivf_binary_topk(
            emb, q1, k=K, rerank_k=RERANK, centroids=cents, n_probe=NPROBE,
            threshold="mean",
        ).write.format("noop").mode("overwrite").save()
    )
    result["ivf_binary_census"] = {
        "nlist": NLIST, "n_probe": NPROBE, "rerank_k": RERANK,
        "n_queries": N_QUERIES,
        "first_pass_code_pairs": int(first_pass_pairs),
        "flat_scan_code_pairs": n * N_QUERIES,
        "first_pass_bytes_approx": int(first_pass_pairs) * 24,
        "flat_scan_bytes_approx": n * N_QUERIES * 24,
        "occupancy_fraction": round(first_pass_pairs / (n * N_QUERIES), 4),
        "recall_at_5_ivf_binary": round(hits1 / (N_QUERIES * K), 4),
        "recall_at_5_ivf_exact_rerank": round(
            hits_ivf / (N_QUERIES * K), 4
        ),
        "wall_min2_s": wall_ivfb,
        "walls_raw": wi,
        "note": "first-pass pairs include the <=1-per-query self match;"
        " recall gap vs ivf_topk is the Hamming shortlist's price at"
        " rerank_k=50",
    }
    print(json.dumps({"ivf_binary_census": result["ivf_binary_census"]}),
          flush=True)

    # --- 3b. the same composed stack on the NON-SATURATING hard fixture ---
    # (the sf1 point saturates recall at 1.0 for both the exact and the
    # Hamming-shortlisted re-rank — copies are trivially nearest; here
    # the shortlist's price and the IVF probe loss are both visible)
    hq = hard.filter(F.col("vec_id") < N_QUERIES)
    hcents = (
        hard.orderBy("vec_id").limit(NLIST)
        .select(F.col("vec_id").alias("cent_id"),
                F.col("embedding").alias("cvec"))
    )
    hexact = S.cosine_topk(hard, hq, k=K).select("query_id", "vec_id")
    hexact.persist()
    hexact.count()
    hres = {}
    for label, frame in (
        ("ivf_binary", S.ivf_binary_topk(
            hard, hq, k=K, rerank_k=RERANK, centroids=hcents,
            n_probe=NPROBE, threshold="mean")),
        ("ivf_exact_rerank", S.ivf_topk(
            hard, hq, k=K, centroids=hcents, n_probe=NPROBE)),
        ("binary_scan_rerank50", S.binary_hamming_topk(
            hard, hq, k=K, rerank_k=RERANK, threshold="mean")),
    ):
        hits = hexact.join(frame.select("query_id", "vec_id"),
                           ["query_id", "vec_id"], "left_semi").count()
        hres[f"recall_at_5_{label}"] = round(hits / (N_QUERIES * K), 4)
    hexact.unpersist()
    hres.update({
        "nlist": NLIST, "n_probe": NPROBE, "rerank_k": RERANK,
        "note": "the axes do NOT compose as a min bound: the in-cell"
        " shortlist of rerank_k covers a far larger fraction of the probed"
        " candidates than a global shortlist of the same size covers of"
        " the full corpus, so ivf_binary can BEAT binary_scan at equal"
        " rerank_k; the gap to ivf_exact_rerank is the Hamming stage's"
        " residual price",
    })
    result["ivf_binary_hard_fixture"] = hres
    print(json.dumps({"ivf_binary_hard_fixture": hres}), flush=True)

    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

"""Round-5 catalog queries: the training-data-pipeline completions —
incremental new-vs-corpus admission dedup, temperature-based source
mixing, rare-bigram LM-proxy quality scoring, and C4-style boilerplate
segment removal. Every oracle restates the full algebra in DuckDB SQL;
every number stays in the exact-integer / correctly-rounded (sqrt, one
division) discipline so hashes match cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hbase_taggregator_spark.oracle_fragments import (
    _SQL_TOKENS,
    _minhash_band_ctes,
)
from hbase_taggregator_spark.util import local_df
from hbase_taggregator_spark.queries import _register, load_table


# ---------------------------------------------------------------------------
# incremental admission dedup (operators/dedup.py::incremental_dedup)
# ---------------------------------------------------------------------------


def _q_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admit the ``doc_id % 5 == 0`` batch against the rest of the corpus:
    asymmetric banded MinHash (corpus never self-joins) + exact Jaccard
    verify at 0.4 on candidate pairs only."""
    from hbase_taggregator_spark.operators.dedup import incremental_dedup

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    return incremental_dedup(corpus, new, threshold=0.4).orderBy("doc_id")


_register(
    "dedup_incremental_admitted",
    _q_incremental,
    f"""
    WITH {_minhash_band_ctes()},
    cbands AS (SELECT * FROM bands WHERE doc_id % 5 <> 0),
    nbands AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
    okc AS (SELECT band_idx, band_key FROM cbands
            GROUP BY 1, 2 HAVING COUNT(*) <= 1000),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
      FROM nbands n
      JOIN okc USING (band_idx, band_key)
      JOIN cbands c USING (band_idx, band_key)),
    shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shx GROUP BY doc_id),
    inter AS (
      SELECT cand.new_id, cand.corpus_id, COUNT(*) AS n_common
      FROM cand JOIN shx a ON a.doc_id = cand.new_id
                JOIN shx b ON b.doc_id = cand.corpus_id AND b.s = a.s
      GROUP BY 1, 2),
    rej AS (
      SELECT DISTINCT new_id
      FROM inter JOIN sizes sn ON sn.doc_id = new_id
                 JOIN sizes sc ON sc.doc_id = corpus_id
      WHERE CAST(n_common AS DOUBLE) / (sn.n_sh + sc.n_sh - n_common)
            >= 0.4)
    SELECT doc_id FROM documents
    WHERE doc_id % 5 = 0 AND doc_id NOT IN (SELECT new_id FROM rej)
    ORDER BY doc_id
    """,
)


# ---------------------------------------------------------------------------
# temperature source mixing (operators/text.py::source_mixing)
# ---------------------------------------------------------------------------


def _q_source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language budgets for a 300-document draw at temperature
    alpha = 0.5 (sqrt flattening — IEEE-correctly-rounded, so the oracle
    hash-matches; the `lang` grouping has real size spread where
    `source` is uniform by construction)."""
    from hbase_taggregator_spark.operators.text import source_mixing

    docs = load_table(spark, sf_dir, "documents")
    return source_mixing(docs, budget=300, group_col="lang", alpha=0.5)


_register(
    "corpus_source_mixing",
    _q_source_mixing,
    """
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang),
    weighted AS (
      SELECT lang, n_docs,
             CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(28,12)) AS w
      FROM counts),
    tot AS (SELECT SUM(w) AS tw FROM weighted),
    alloc AS (
      SELECT lang, n_docs, CAST(w AS DOUBLE) AS weight,
             300.0 * (CAST(w AS DOUBLE) / CAST(tw AS DOUBLE)) AS raw
      FROM weighted, tot),
    a2 AS (
      SELECT lang, n_docs, weight,
             LEAST(n_docs, CAST(FLOOR(raw) AS BIGINT)) AS t0,
             raw - FLOOR(raw) AS frac,
             CASE WHEN CAST(FLOOR(raw) AS BIGINT) < n_docs
                  THEN 1 ELSE 0 END AS unc
      FROM alloc),
    tots AS (SELECT SUM(t0) AS st, SUM(unc) AS nu FROM a2),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY unc DESC, frac DESC, lang ASC)
               AS r
      FROM a2)
    SELECT lang, n_docs, weight,
           CAST(t0 + CASE WHEN unc = 1
                           AND r <= LEAST(GREATEST(300 - st, 0), nu)
                          THEN 1 ELSE 0 END AS BIGINT) AS target_n
    FROM rk, tots
    ORDER BY lang
    """,
)


# ---------------------------------------------------------------------------
# rare-bigram LM-proxy quality score (operators/text.py::rare_bigram_ratio)
# ---------------------------------------------------------------------------


def _q_rare_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_taggregator_spark.operators.text import rare_bigram_ratio

    docs = load_table(spark, sf_dir, "documents")
    return rare_bigram_ratio(docs, max_freq=2).orderBy("doc_id")


_register(
    "text_rare_bigram_ratio",
    _q_rare_bigram,
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
    bg AS (
      SELECT doc_id, unnest(list_transform(
        generate_series(1, greatest(len(toks) - 1, 0)),
        i -> array_to_string(toks[i:i+1], ' '))) AS bg
      FROM t),
    freq AS (SELECT bg, COUNT(*) AS f FROM bg GROUP BY bg)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN f <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
           CAST(SUM(CASE WHEN f <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS rare_ratio
    FROM bg JOIN freq USING (bg)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)


# ---------------------------------------------------------------------------
# boilerplate segment removal (operators/text.py::remove_boilerplate)
# ---------------------------------------------------------------------------


def _q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip segments (token-granularity on the single-line synthetic
    corpus — delimiter ' ') present in >= 90% of documents; real corpora
    run this with the default newline delimiter. min_docs derives from
    the corpus size so the query scales; the oracle derives the identical
    threshold from COUNT(*)."""
    from hbase_taggregator_spark.operators.text import remove_boilerplate

    docs = load_table(spark, sf_dir, "documents")
    min_docs = (9 * docs.count()) // 10
    return remove_boilerplate(
        docs, min_docs=min_docs, delimiter=" "
    ).orderBy("doc_id")


_register(
    "corpus_clean_boilerplate",
    _q_boilerplate,
    """
    WITH md AS (SELECT (9 * COUNT(*)) // 10 AS min_docs FROM documents),
    segs AS (
      SELECT doc_id, i - 1 AS pos, s[i] AS seg
      FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
           (SELECT unnest(generate_series(1, (
              SELECT MAX(len(string_split(text, ' '))) FROM documents))) AS i)
      WHERE i <= len(s)),
    boiler AS (
      SELECT seg FROM segs
      GROUP BY seg
      HAVING COUNT(DISTINCT doc_id) >= (SELECT min_docs FROM md)),
    flagged AS (
      SELECT segs.*, (b.seg IS NOT NULL) AS is_b
      FROM segs LEFT JOIN boiler b USING (seg))
    SELECT doc_id,
           COALESCE(string_agg(seg, ' ' ORDER BY pos)
                    FILTER (WHERE NOT is_b), '') AS clean_text,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
    FROM flagged
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)




# ---------------------------------------------------------------------------
# intra-document segment dedup (operators/text.py::dedup_doc_segments)
# ---------------------------------------------------------------------------


def _q_doc_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeat removal at token granularity (the synthetic
    corpus is single-line; real corpora use the newline default). Pure
    map-side — the plan audit pins zero exchanges before the ORDER BY."""
    from hbase_taggregator_spark.operators.text import dedup_doc_segments

    docs = load_table(spark, sf_dir, "documents")
    return dedup_doc_segments(docs, delimiter=" ").orderBy("doc_id")


_register(
    "corpus_dedup_doc_segments",
    _q_doc_segments,
    """
    WITH s AS (SELECT doc_id, string_split(text, ' ') AS segs FROM documents),
    k AS (
      SELECT doc_id, segs,
             list_filter(list_zip(segs, generate_series(1, len(segs))),
                         e -> list_position(segs, e[1]) = e[2]) AS kept
      FROM s)
    SELECT doc_id,
           array_to_string(list_transform(kept, e -> e[1]), ' ') AS clean_text,
           CAST(len(segs) AS BIGINT) AS n_segments,
           CAST(len(segs) - len(kept) AS BIGINT) AS n_removed
    FROM k
    ORDER BY doc_id
    """,
)




# ---------------------------------------------------------------------------
# link-graph PageRank quality signal (operators/graph.py::pagerank)
# ---------------------------------------------------------------------------


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier → customer fulfillment graph (distinct
    edges from lineitem ⋈ orders; customer nodes offset by 1e6 so the two
    integer key spaces cannot collide) — the relational power method the
    URL-graph quality priors of web-corpus curation use, run for 3 fixed
    steps."""
    from hbase_taggregator_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    edges = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1_000_000) + F.col("o_custkey")).alias("dst"),
    )
    return pagerank(edges, n_iter=3, damping=0.85).orderBy("node")


def _pagerank_sql(n_iter: int = 3, damping: float = 0.85) -> str:
    # embed the EXACT IEEE constants the Spark side computes in Python so
    # both engines run the identical arithmetic (1 - 0.85 is NOT 0.15 in
    # binary floating point)
    d = repr(damping)
    base = repr(1.0 - damping)
    ctes = [
        """e AS (SELECT DISTINCT l_suppkey AS src, 1000000 + o_custkey AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    od AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS od FROM e GROUP BY src),
    r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
           FROM nodes)"""
    ]
    for i in range(1, n_iter + 1):
        ctes.append(f"""r{i} AS (
      SELECT nodes.node,
             {base} / (SELECT n FROM nn)
             + {d} * COALESCE(c.s, CAST(0.0 AS DOUBLE)) AS rank
      FROM nodes LEFT JOIN (
        SELECT e.dst AS node,
               CAST(SUM(CAST(r.rank / od.od AS DECIMAL(38,18))) AS DOUBLE) AS s
        FROM e JOIN r{i - 1} r ON r.node = e.src
               JOIN od ON od.src = e.src
        GROUP BY e.dst) c ON c.node = nodes.node)""")
    return (
        "\n    WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT node, rank FROM r{n_iter} ORDER BY node\n    "
    )


_register("graph_pagerank_suppliers", _q_pagerank, _pagerank_sql())




# ---------------------------------------------------------------------------
# ORC sink/source round-trip (sources/sinks.py::write_orc)
# ---------------------------------------------------------------------------


def _q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-sink gate for ORC (same checksum discipline as the
    CSV/JSON round-trip): write the corpus to ORC, read it back, and
    aggregate per language with an md5-derived content checksum — any
    codec corruption breaks the hash against the parquet-sourced
    oracle."""
    import tempfile

    from hbase_taggregator_spark.operators.dedup import _hash60
    from hbase_taggregator_spark.sources.sinks import write_orc

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    ck = _hash60(F.concat(F.lit("ck#"), F.col("text"))) % 1_000_003
    with tempfile.TemporaryDirectory() as d:
        write_orc(docs, f"{d}/orc")
        back = spark.read.schema(docs.schema).orc(f"{d}/orc")
        out = back.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(ck).alias("text_checksum"),
        )
        res = local_df(spark, out.collect(), out.schema)
    return res.orderBy("lang")


_register(
    "sink_orc_roundtrip",
    _q_orc_roundtrip,
    """
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(CAST(concat('0x', substr(md5(concat('ck#', text)), 1, 15))
                    AS BIGINT) % 1000003) AS BIGINT) AS text_checksum
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)




# ---------------------------------------------------------------------------
# hot-key skew report (operators/profile.py::skew_report)
# ---------------------------------------------------------------------------


def _q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 hottest (event_type, user_id % 100) composite keys in the
    events table — the pre-shuffle diagnostic for salting decisions."""
    from hbase_taggregator_spark.operators.profile import skew_report

    ev = load_table(spark, sf_dir, "events").withColumn(
        "user_mod", F.col("user_id") % 100
    )
    return skew_report(ev, ["event_type", "user_mod"], k=10)


_register(
    "profile_skew_report",
    _q_skew_report,
    r"""
    WITH counts AS (
      SELECT concat_ws('|',
               CASE WHEN event_type IS NULL THEN '\N'
                    ELSE replace(replace(event_type, '\', '\\'), '|', '\|')
               END,
               CASE WHEN user_id IS NULL THEN '\N'
                    ELSE replace(replace(CAST(user_id % 100 AS VARCHAR),
                                         '\', '\\'), '|', '\|')
               END) AS key,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM events GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_rows) AS DOUBLE) AS total,
                   CAST(COUNT(*) AS DOUBLE) AS nkeys FROM counts),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY n_rows DESC, key ASC) AS rank
      FROM counts)
    SELECT CAST(rank AS INTEGER) AS rank, key, n_rows,
           CAST(n_rows AS DOUBLE) / total AS share,
           CAST(n_rows AS DOUBLE) / (total / nkeys) AS ratio_to_avg
    FROM ranked, tot
    WHERE rank <= 10
    ORDER BY rank
    """,
)


# ---------------------------------------------------------------------------
# embedding duplicate clusters (lsh_neardup_pairs ∘ duplicate_components)
# ---------------------------------------------------------------------------

# Safe top-level import from the ring: _lsh_neardup_sql is defined ~3000
# lines BEFORE queries_ext's end-of-module import of this module, so the
# name is bound on every entry path (unlike the r4 regression, where the
# imported name was defined AFTER the ring's import point).
from hbase_taggregator_spark.queries_ext import _lsh_neardup_sql  # noqa: E402


def _q_emb_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate CLUSTERS: sign-LSH bucketed cosine pairs
    at 0.42 collapsed by min-label connected components — 'A~B, B~C' is
    one keep-decision for {A,B,C}, the same composition the text funnel
    uses, over the vector modality."""
    from hbase_taggregator_spark.operators.dedup import duplicate_components
    from hbase_taggregator_spark.operators.similarity import lsh_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = lsh_neardup_pairs(emb, threshold=0.42)
    return duplicate_components(pairs).select(
        F.col("node_id").alias("vec_id"), "component_id", "component_size"
    ).orderBy("vec_id")


_register(
    "similarity_dup_clusters",
    _q_emb_clusters,
    f"""
    WITH RECURSIVE pairs0 AS ({_lsh_neardup_sql()}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs0
              UNION SELECT id_b, id_a FROM pairs0),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, lbl) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT r.id, e.dst FROM reach r JOIN edges e ON e.src = r.lbl),
    comp AS (SELECT id, MIN(lbl) AS component_id FROM reach GROUP BY id),
    csize AS (SELECT component_id, CAST(COUNT(*) AS BIGINT)
                AS component_size FROM comp GROUP BY 1)
    SELECT id AS vec_id, component_id, component_size
    FROM comp JOIN csize USING (component_id)
    ORDER BY vec_id
    """,
)


# re-apply the gate-window ordering now that round-5 queries are
# registered (tolerant on every import path, same as queries_r3/r4 —
# whichever module finishes last sees the full catalog).
from hbase_taggregator_spark.queries_ext import _apply_gate_window  # noqa: E402

_apply_gate_window(strict=False)

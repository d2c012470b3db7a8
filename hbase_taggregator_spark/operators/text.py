"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in column functions (JVM-side, codegen) —
no Python UDFs: tokenization is `split`, ratios are `regexp_count`/`size`,
fingerprints are `md5`. Every operator is also expressible in portable SQL,
which the query catalog uses for its DuckDB oracles.

At 100 TB these run as pure map-side projections over the document scan —
no shuffle at all until a downstream aggregation asks for one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: marker stopwords per language for the n-gram/stopword language heuristic.
#: Deterministic preference order breaks score ties.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "to", "in"),
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "es": ("el", "la", "que", "los", "por", "una"),
    "fr": ("le", "les", "des", "est", "dans", "une"),
    "zh": ("的", "是", "了", "在", "和", "不"),
}

STOPWORDS = LANG_MARKERS["en"] + ("a", "an", "it", "for", "on", "with")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (lowercased). `split` on \\s+ after trim —
    identical semantics in Spark and DuckDB's regexp splitters."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(F.lower(c)), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals: length, token stats, punctuation and
    stopword ratios — the standard cheap filters of a pretraining pipeline.
    Pure projection; ratios are exact rationals cast to double at the end."""
    toks = tokens(text_col)
    n_chars = F.length(F.col(text_col))
    n_toks = F.size(toks)
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", ""))
    n_stop = _count_in(toks, STOPWORDS)
    return df.select(
        "*",
        n_chars.alias("q_n_chars"),
        n_toks.alias("q_n_tokens"),
        (n_chars.cast("double") / n_toks).alias("q_chars_per_token"),
        (n_punct.cast("double") / n_chars).alias("q_punct_ratio"),
        (n_stop.cast("double") / n_toks).alias("q_stopword_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Marker-stopword language heuristic: per-language marker-token counts,
    argmax with a fixed preference order, 'und' when no marker hits.

    (A production system would swap in a fastText/CLD model as a pandas UDF;
    the heuristic keeps the operator JVM-side and deterministic.)"""
    toks = tokens(text_col)
    scores = {lang: _count_in(toks, words) for lang, words in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    pred = F.lit("und")
    # build the when-chain in reverse preference order so earlier languages
    # win ties (>= against all later candidates)
    for lang in reversed(langs):
        later = langs[langs.index(lang) + 1:]
        cond = scores[lang] > 0
        for o in later:
            cond = cond & (scores[lang] >= scores[o])
        for o in langs[: langs.index(lang)]:
            cond = cond & (scores[lang] > scores[o])
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return df.withColumn(out_col, pred)


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp") -> DataFrame:
    """Normalized-content fingerprint: md5 of lowercase, whitespace-collapsed
    text. Stable across engines; the key for exact dedup."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out_col, F.md5(norm))


def repetition_features(
    df: DataFrame, text_col: str = "text", n: int = 2
) -> DataFrame:
    """Repetition signals — the standard boilerplate/low-quality detector
    for pretraining corpora: the share of the document covered by its most
    frequent word n-gram, and the distinct/total n-gram ratio. A spammy
    page repeating one phrase scores high top-share and low distinct ratio.

    Relational formulation: explode n-grams (NOT distinct — counts matter),
    count per (doc, gram), then one aggregation per doc. Shuffle carries
    (doc, gram) partial counts — map-side combine keeps it bounded."""
    toks = tokens(text_col)
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    from hbase_taggregator_spark.util import ensure_parallelism

    exploded = ensure_parallelism(df.select("doc_id", text_col)).select(
        F.col("doc_id"), F.explode(grams).alias("g")
    )
    per_gram = exploded.groupBy("doc_id", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.max("c").alias("top_gram_count"),
        F.count(F.lit(1)).alias("n_distinct_grams"),
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "top_gram_count",
        (F.col("top_gram_count").cast("double") / F.col("n_grams"))
        .alias("top_gram_share"),
        (F.col("n_distinct_grams").cast("double") / F.col("n_grams"))
        .alias("distinct_gram_ratio"),
    )


#: pattern-count surface signals (PII-adjacent filtering): portable regexes
#: that mean the same thing to Spark (Java) and DuckDB (RE2) engines.
PATTERNS: dict[str, str] = {
    "n_emails": r"[a-z0-9._-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "n_urls": r"https?://[^\s]+",
    "n_digits_runs": r"[0-9]{4,}",
}


def pattern_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Count PII-adjacent surface patterns (emails, URLs, long digit runs)
    per document — the cheap pre-filter before a real PII pipeline. Pure
    projection (regexp_count is codegen'd)."""
    out = df
    for name, pat in PATTERNS.items():
        out = out.withColumn(
            name, F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pat), 0))
        )
    return out


def train_val_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_fraction: float = 0.1,
    buckets: int = 1000,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic hash-based train/validation assignment: bucket =
    md5(id) mod ``buckets``; the first ``val_fraction·buckets`` buckets are
    validation. Engine-portable (md5, not Spark-private hash), stable under
    reruns/appends — the property that matters when the corpus is rebuilt:
    a document never migrates between splits."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long") % buckets
    )
    threshold = int(val_fraction * buckets)
    return df.withColumn("split_bucket", bucket).withColumn(
        out_col,
        F.when(F.col("split_bucket") < threshold, F.lit("val")).otherwise(
            F.lit("train")
        ),
    )


def doc_chunks(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    standard pre-tokenization chunking step for context-length-bounded
    training. Chunk starts advance by ``chunk_tokens - overlap``; the last
    window may be short; empty docs yield no chunks.

    Pure map-side: sequence + transform + posexplode, no shuffle. Integer
    chunk-count algebra (no float ceil) so both engines agree exactly."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    # 1 chunk for n <= chunk_tokens, else 1 + ceil((n-chunk)/stride), in ints
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        1
        + F.greatest(
            F.lit(0),
            ((n - chunk_tokens + stride - 1) / stride).cast("int"),
        )
    )
    starts = F.when(
        n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
    ).otherwise(F.array().cast("array<int>"))
    with_toks = df.select("doc_id", toks.alias("toks"), F.posexplode(starts))
    chunk = F.slice(F.col("toks"), F.col("col") * stride + 1, chunk_tokens)
    return with_toks.select(
        "doc_id",
        F.col("col").alias("chunk_idx"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_fp"),
    )


def pack_sequences(
    df: DataFrame,
    ctx_len: int = 256,
    n_shards: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Concatenate-then-split sequence packing: documents are laid out in
    deterministic order and cut into ``ctx_len``-token bins; each document
    is assigned the bin where its first token lands. Packing runs
    independently per md5 shard — the window's partition key — so at 100 TB
    every shard packs in parallel instead of one global sort."""
    nt = token_count(text_col)
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % n_shards
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = df.select(F.col("doc_id"), shard.alias("shard"), nt.alias("n_tokens"))
    d = d.withColumn(
        "start_tok", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    )
    return d.select(
        "shard",
        (F.col("start_tok") / ctx_len).cast("long").alias("bin_idx"),
        "doc_id",
        "n_tokens",
        "start_tok",
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BM25 relevance for a fixed term set — the corpus-level
    keyword-retrieval primitive (quality filtering by topic words, seed-set
    expansion, contamination checks against eval-suite terms).

    Uses the *rational* Robertson idf, ``idf' = (N - df + 0.5)/(df + 0.5)
    + 1`` — the exponential of the classic log idf. Per term it is the same
    monotone document ordering; it is chosen because every operation in the
    whole score (+, −, ×, ÷ on doubles) is an IEEE-754 correctly-rounded
    primitive, so the DuckDB oracle restating the identical expression tree
    is bit-equal — ``ln`` carries no such cross-engine guarantee. The
    tf side is standard: ``tf·(k1+1) / (tf + k1·((1−b) + b·dl/avgdl))``.

    Physical shape at 100 TB: tokens explode map-side and are FILTERED TO
    THE QUERY TERMS before any shuffle, so the aggregation state is
    O(docs × |terms|), never O(corpus tokens); df/N/avgdl are one tiny
    broadcast row. Output: one row per document with ≥1 matching term —
    (id, n_terms_matched, bm25).
    """
    toks = tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("__toks")).withColumn(
        "dl", F.size("__toks")
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    term_rows = base.select(
        id_col, "dl", F.explode("__toks").alias("term")
    ).filter(F.col("term").isin(list(query_terms)))
    tf = term_rows.groupBy(id_col, "term", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = (
        (F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5)) + F.lit(1.0)
    tfn = (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / (
        F.col("tf").cast("double")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("score", idf * tfn)
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.sum(F.col("score").cast("decimal(18,12)"))
            .cast("double")
            .alias("bm25"),
        )
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    buckets: int = 10_000,
    seed: str = "mix",
) -> DataFrame:
    """Deterministic per-stratum sampling — the data-mixing primitive
    (up-/down-weight sources or languages when composing a training blend).
    A document is kept iff ``md5(seed:stratum:id) mod buckets <
    fraction·buckets``; strata absent from ``fractions`` are dropped.
    Hash-based (not ``sample()``): stable under reruns, appends, and
    repartitioning — a document never flips in or out of the blend when the
    corpus is rebuilt. Pure map-side filter, no shuffle, engine-portable
    md5 algebra (the oracle restates the same CASE over the same hash).
    """
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(seed),
                        F.col(strata_col),
                        F.col(id_col).cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % buckets
    )
    expr = None
    for stratum, frac in sorted(fractions.items()):
        t = int(frac * buckets)
        cond = F.col(strata_col) == stratum
        expr = F.when(cond, F.lit(t)) if expr is None else expr.when(cond, F.lit(t))
    threshold = expr.otherwise(F.lit(0)) if expr is not None else F.lit(0)
    return df.withColumn("mix_bucket", bucket).filter(
        F.col("mix_bucket") < threshold
    )


def top_terms(
    df: DataFrame,
    k: int = 10,
    group_cols: tuple[str, ...] = (),
    text_col: str = "text",
) -> DataFrame:
    """Exact heavy hitters: the top-k most frequent tokens, overall or per
    group (vocabulary heads per language/source — the frequency profile
    step of corpus analysis). Map-side explode feeds a partial/final count
    aggregation (shuffle carries one row per distinct (group, term) per
    partition, never raw tokens), then one row_number window per group.
    Deterministic: ties break on the term itself.
    """
    from pyspark.sql import Window

    t = df.select(*group_cols, F.explode(tokens(text_col)).alias("term"))
    counts = t.groupBy(*group_cols, "term").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("n_occurrences"), F.col("term")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*group_cols, "rank", "term", "n_occurrences")
    )


def vocabulary(
    df: DataFrame,
    min_df: int = 1,
    max_terms: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary build: one row per surviving term with its document
    frequency, total occurrence count, and a dense contiguous ``term_id``
    assigned by ``(df DESC, term ASC)`` — the deterministic term→id mapping
    a tokenizer-training or feature-hashing pipeline needs (reference has no
    text surface; north-star training-pipeline op).

    Physical shape at 100 TB: tokens explode map-side and feed ONE
    partial/final aggregation keyed on term (shuffle carries per-partition
    (term, df, tf) partials, never raw tokens). The ``term_id`` ranking is
    a single-partition window — over the *vocabulary*, which is bounded by
    distinct terms (millions), not corpus size; with ``max_terms`` the cap
    applies after the rank so the id space is a stable prefix: growing the
    corpus can reorder ids only where counts actually change.
    """
    from pyspark.sql import Window

    t = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    per_doc = t.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    stats = per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
    ).filter(F.col("df") >= min_df)
    w = Window.orderBy(F.desc("df"), F.col("term"))
    out = stats.withColumn("term_id", F.row_number().over(w).cast("long"))
    if max_terms is not None:
        out = out.filter(F.col("term_id") <= max_terms)
    return out.select("term_id", "term", "df", "total_tf")


def posting_lists(
    df: DataFrame,
    min_df: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Secondary-index build: per term, the sorted posting list of
    ``(doc_id, tf)`` pairs — emitted as the canonical string
    ``"id:tf,id:tf,..."`` (doc_id ascending) so the result is plain
    hashable rows for the correctness gate; a production variant would keep
    the ``array<struct>`` column and write it bucketed by term.

    Physical shape at 100 TB: map-side explode → partial/final count on
    (term, doc) → one ``collect_list`` aggregation per term. The posting
    string for a term is O(df) — for web-scale stopword terms pair this
    with a ``min_df``/``max_df`` band or the df-cap guard used by
    ``jaccard_pairs``; ``array_sort`` bounds the per-group memory to the
    already-aggregated list, and nothing ever shuffles raw tokens.
    """
    t = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    per_doc = t.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    lists = per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(id_col).alias("d"), "tf"))
                ),
                lambda s: F.concat_ws(":", s["d"], s["tf"]),
            ),
            ",",
        ).alias("postings"),
    )
    return lists.filter(F.col("df") >= min_df).select(
        "term", "df", "total_tf", "postings"
    )


def conjunctive_search(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """AND-query over the inverted index: documents containing EVERY query
    term, scored by total matched-term occurrences. This is the posting-
    list-intersection read path of a secondary index, expressed
    relationally: explode → filter to the query terms BEFORE any shuffle
    (state is O(docs_with_a_term × |terms|), never corpus tokens) →
    group-by-doc HAVING distinct-term count == |terms|. Catalyst keeps the
    term filter map-side; the single shuffle is keyed on doc id.
    """
    n = len(terms)
    t = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    hits = t.filter(F.col("term").isin(list(terms)))
    return (
        hits.groupBy(id_col)
        .agg(
            F.count_distinct(F.col("term")).alias("n_terms"),
            F.count(F.lit(1)).alias("total_tf"),
        )
        .filter(F.col("n_terms") == n)
        .select(id_col, "total_tf")
    )


def feature_hash_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    seed: str = "fh",
) -> DataFrame:
    """Hashing-trick token features (Weinberger et al. 2009): each token
    maps to ``hash60(seed # token) mod dim``; output is the sparse
    (id, bucket, tf) representation every linear/NB text model consumes.
    No vocabulary pass, no driver state — the property that makes the
    trick the 100 TB featurizer (a vocabulary build is itself a full
    shuffle; this is explode + one partial/final count on (id, bucket)).
    md5 bucketing keeps the exact feature values oracle-reproducible."""
    # local import: dedup imports this module (tokens/fingerprint)
    from hbase_taggregator_spark.operators.dedup import _hash60

    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    toks = tokens(F.col(text_col))
    return (
        df.select(F.col(id_col), F.explode(toks).alias("tok"))
        .filter(F.col("tok") != "")
        .select(
            id_col,
            (_hash60(F.concat(F.lit(f"{seed}#"), F.col("tok"))) % dim).alias(
                "bucket"
            ),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(id_col, "bucket")
    )


def rare_token_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 2,
) -> DataFrame:
    """Perplexity-proxy quality signal in exact integer algebra: the
    fraction of a document's token OCCURRENCES whose corpus document
    frequency is ≤ ``max_df`` (rare/garbled tokens → high ratio; real
    log-prob scoring is libm-dependent and not engine-portable, this is
    the standard integer-exact stand-in). Two passes over the tokens:
    a df build (distinct (token, doc) → count per token) and an
    occurrence join.

    Physical shape at 100 TB: both passes shuffle on the token — the df
    side collapses to vocabulary size first, so the join's build side is
    the (small) rare-token subset and broadcasts; the occurrence side
    probes map-side.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    dfreq = (
        toks.distinct()
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    rare = dfreq.filter(F.col("__df") <= max_df).select("tok")
    # one occurrence pass: the broadcast rare set joins in as a flag and
    # totals + rare counts aggregate together (separate hits/totals
    # passes would tokenize and explode the corpus twice more)
    flagged = toks.join(
        F.broadcast(rare.withColumn("__rare", F.lit(1))), "tok", "left"
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.col("__rare")).alias("n_rare"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_rare",
            (
                F.col("n_rare").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("rare_ratio"),
        )
        .orderBy(id_col)
    )


def deterministic_sample(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    id_col: str = "doc_id",
    seed: str = "sample",
) -> DataFrame:
    """Reproducible k-per-group subsample — the distributed answer to
    reservoir sampling for training-data curation (per-source / per-language
    quota draws). Each row's sort key is a salted md5 of its id: uniform,
    engine-portable, and REBUILD-STABLE — re-running over a grown corpus
    keeps every previously-sampled row whose hash still ranks in the top k,
    unlike `rand()` which resamples everything on every run.

    One shuffle on the group key; per-group sort is partition-local
    (row_number window, no global sort). Ties in the 128-bit hash are
    broken by id for full determinism.

    For k ≪ group size the shuffle does NOT carry whole groups: Catalyst
    rewrites ``row_number() <= k`` into a map-side Partial
    ``WindowGroupLimit`` (SPARK-37099) that keeps only the top-k rows per
    group per input partition before the exchange, then a Final pass after
    it — the classic two-phase top-k, planned automatically.
    ``tests/test_round5.py::test_deterministic_sample_plans_partial_group_limit``
    pins the rewrite so a regression (e.g. an expression form the rule
    can't match) is caught.
    """
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(seed + "#"), F.col(id_col).cast("string")))
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def global_shuffle(
    df: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    seed: str = "shuf",
) -> DataFrame:
    """Deterministic pseudo-random global ordering for training-data
    delivery: every row gets a (shard, pos) address such that reading
    shards in order, each sorted by pos, visits the corpus in a fixed
    hash-random permutation.

    This is the 100 TB shape of "ORDER BY random()": shard assignment is a
    map-side projection (top hex of a salted md5, mod n_shards — uniform),
    and position is a row_number per shard — a per-shard sort, NEVER a
    single global sort. n_shards is the write parallelism: size it so one
    shard's rows fit an executor's sort buffer (n_shards ≈ corpus /
    2 GiB). Re-running with the same seed reproduces the exact epoch
    order — auditable training-data lineage.
    """
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(seed + "#"), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    out = df.withColumn("__h", h).withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(F.col("__h").asc(), F.col(id_col).asc())
    return out.withColumn("pos", F.row_number().over(w)).drop("__h")


def source_mixing(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based source mixing plan: per-source document budgets
    ``target_n ∝ n^alpha`` — the standard up/down-weighting of corpus
    sources for training-data composition (alpha < 1 flattens the natural
    size distribution toward uniform; alpha = 1 is proportional).

    One partial/final count aggregate over the corpus; everything after
    runs on |sources| rows (a scalar-subquery-sized frame). Targets are
    capped at the source's own size (no oversampling) — pair with
    :func:`deterministic_sample` (k = target_n per source) to realize the
    draw.

    Budget discipline: per-source floors alone undershoot the budget by
    up to |sources| - 1 rows, so a largest-remainder pass redistributes
    the rounding residual — uncapped sources ranked by fractional
    remainder (ties by group name) each take +1 until the residual is
    spent. The residual is computed as ``budget - sum(floored targets)``,
    so capped shortfall DOES feed the remainder pool — but each uncapped
    source can absorb at most its one +1 unit, so at most one rounding
    unit per uncapped source of capped mass is reallocated; the BULK of
    the capped shortfall is deliberately left unallocated (pushing it
    onto the uncapped sources wholesale would re-weight them away from
    the requested temperature curve). When
    caps bite, ``sum(target_n) < budget``; the undershoot is the capped
    mass minus whatever rounding units the remainder pass could absorb
    (so compute a residual budget as ``budget - sum(target_n)`` from the
    OUTPUT, not from the raw shares). Capped rows are visible as
    ``n_docs == target_n``; callers who want the full budget re-run on
    the uncapped remainder with that residual budget (one more
    |sources|-row pass).

    Engine-portable arithmetic discipline: the default alpha = 0.5 keeps
    every number exactly reproducible cross-engine — n^0.5 is ``sqrt``
    (IEEE-correctly-rounded in both engines, unlike ``pow``), weights are
    pinned to DECIMAL(28,12) before the sum so the total is
    order-independent, and the final share/target divisions are single
    correctly-rounded double ops. Non-half alpha values go through
    ``pow`` — fine operationally, but not hash-exact across engines
    (documented, like the other rows-only seams).

    Output: (group_col, n_docs, weight, target_n) sorted by group.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    if alpha == 0.5:
        w = F.sqrt(F.col("n_docs").cast("double"))
    elif alpha == 1.0:
        w = F.col("n_docs").cast("double")
    else:
        w = F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
    from pyspark.sql.window import Window

    weighted = counts.withColumn("weight", w.cast("decimal(28,12)"))
    total = weighted.agg(F.sum("weight").alias("__tw"))
    raw = F.lit(float(budget)) * (
        F.col("weight").cast("double") / F.col("__tw").cast("double")
    )
    alloc = weighted.crossJoin(F.broadcast(total)).select(
        group_col,
        "n_docs",
        F.col("weight").cast("double").alias("weight"),
        F.least(F.col("n_docs"), F.floor(raw).cast("long")).alias("__t0"),
        (raw - F.floor(raw)).alias("__frac"),
        # can absorb +1 iff the floor target sits strictly below the cap
        F.when(F.floor(raw).cast("long") < F.col("n_docs"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("__unc"),
    )
    # largest-remainder pass over the |sources|-row frame: residual units
    # (bounded by the uncapped-source count) go +1 each to the largest
    # fractional remainders; the window and aggregates run on a frame of
    # |sources| rows, never the corpus
    tots = alloc.agg(
        F.sum("__t0").alias("__st"), F.sum("__unc").alias("__nu")
    )
    rk = Window.orderBy(
        F.desc("__unc"), F.desc("__frac"), F.asc(group_col)
    )
    units = F.least(
        F.greatest(F.lit(budget) - F.col("__st"), F.lit(0)), F.col("__nu")
    )
    return (
        alloc.withColumn("__r", F.row_number().over(rk))
        .crossJoin(F.broadcast(tots))
        .select(
            group_col,
            "n_docs",
            "weight",
            (
                F.col("__t0")
                + F.when(
                    (F.col("__unc") == 1) & (F.col("__r") <= units), F.lit(1)
                ).otherwise(F.lit(0))
            ).alias("target_n"),
        )
        .orderBy(group_col)
    )


def rare_bigram_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_freq: int = 2,
) -> DataFrame:
    """Language-model-proxy quality score without the language model: the
    share of a document's bigram OCCURRENCES whose corpus-wide frequency
    is ≤ ``max_freq``. Documents full of never-seen-elsewhere bigrams are
    the tail an n-gram LM would assign high perplexity (gibberish, OCR
    noise, mixed-language shards); documents of only-common bigrams are
    boilerplate. Occurrence-weighted on purpose — a doc repeating one
    rare bigram 50 times scores 50/n, matching the LM-cross-entropy view
    (and unlike :func:`rare_token_ratio`, which is distinct-type-based).

    Kept exact-integer + one correctly-rounded division so the oracle
    hash-matches (an actual ln-probability score would hang on
    non-correctly-rounded transcendentals — the one arithmetic class this
    codebase keeps out of oracle-gated columns).

    Two shuffles at scale: bigram-frequency aggregate (partial/final,
    map-side combined), then the per-doc aggregate keyed on ``id_col``;
    the frequency table joins on the bigram key the explode already
    produced. Output: (id_col, n_bigrams, n_rare, rare_ratio); documents
    with < 2 tokens have no bigram and are absent (no 0/0 row).
    """
    toks = tokens(F.col(text_col))
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, 2)))
    from hbase_taggregator_spark.util import ensure_parallelism

    # spread the narrow (id, text) input BEFORE the explode (same reason
    # as repetition_features: each doc ships once, and the 100-300× bigram
    # fan-out evaluates across all cores instead of the scan's partitions)
    bg = ensure_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(grams).alias("bg")
    )
    freq = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("__f"))
    return (
        bg.join(freq, "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                F.when(F.col("__f") <= max_freq, 1).otherwise(0)
            ).alias("n_rare"),
        )
        .select(
            id_col,
            "n_bigrams",
            "n_rare",
            (
                F.col("n_rare").cast("double")
                / F.col("n_bigrams").cast("double")
            ).alias("rare_ratio"),
        )
    )


def remove_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 10,
    delimiter: str = "\n",
) -> DataFrame:
    """C4-style boilerplate-segment removal: split each document on
    ``delimiter``, drop every segment that occurs (verbatim) in at least
    ``min_docs`` DISTINCT documents — nav bars, cookie banners, license
    footers — and reassemble the remainder in original order. The classic
    web-corpus cleaning pass that line-level dedup papers (C4, RefinedWeb)
    apply before document-level dedup.

    Physical shape at 100 TB: one exploded (segment, doc) pass feeds a
    partial/final distinct-doc count; the boilerplate set (segments above
    threshold — tiny: boilerplate is by definition low-cardinality) comes
    back as a broadcast hash join against the exploded segments, so the
    corpus-side filter is map-side; reassembly is ONE shuffle keyed on
    ``id_col`` (sort_array over collected (pos, segment) structs — a
    per-doc, not global, sort). Documents whose every segment is
    boilerplate survive with empty text (drop them downstream with a
    length filter if desired — silently losing rows is not this
    operator's call).

    Output: (id_col, clean_text, n_segments, n_removed).
    """
    from hbase_taggregator_spark.util import ensure_parallelism

    segs = ensure_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(delimiter), -1)).alias(
            "pos", "seg"
        ),
    )
    boiler = (
        segs.groupBy("seg")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("seg")
    )
    flagged = segs.join(
        F.broadcast(boiler.withColumn("__is_b", F.lit(1))), "seg", "left"
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__is_b").isNull(),
                                F.struct("pos", "seg"),
                            )
                        )
                    ),
                    lambda s: s["seg"],
                ),
                delimiter,
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.coalesce(F.col("__is_b"), F.lit(0))).alias("n_removed"),
        )
        .select(id_col, "clean_text", "n_segments", "n_removed")
    )


def dedup_doc_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = "\n",
) -> DataFrame:
    """INTRA-document segment dedup: drop every repeated occurrence of a
    segment within the same document (keep the first, preserve order) —
    the within-page half of line-level corpus cleaning (C4 dedups lines
    both within and across pages; :func:`remove_boilerplate` is the
    across-pages half).

    ZERO shuffle at scale — the operator is one projection over the
    document scan built from array higher-order functions: split → zip
    with positions → keep elements whose ``array_position`` (first index)
    equals their own → reassemble. At 100 TB this runs at scan speed and
    composes map-side with any downstream filter. Quadratic only in
    segments-per-document (array_position is a linear scan per element),
    which is bounded by page size, not corpus size. The one exception to
    shuffle-freedom: a SMALL scan (fewer file splits than cores) is
    spread first via ``ensure_parallelism`` — without it the whole
    corpus's quadratic work serializes on one core (observed 13× at
    sf0.1); a real table has thousands of splits and is untouched.

    Output: (id_col, clean_text, n_segments, n_removed).
    """
    from hbase_taggregator_spark.util import ensure_parallelism

    arr = F.split(F.col(text_col), F.lit(delimiter), -1)
    kept = F.filter(
        F.zip_with(
            arr,
            F.sequence(F.lit(1), F.size(arr)),
            lambda x, i: F.struct(x.alias("s"), i.alias("i")),
        ),
        lambda e: F.array_position(arr, e["s"]) == e["i"],
    )
    # spread a one-partition scan first: the per-doc cost is quadratic in
    # segment count, and on a small file the whole corpus would otherwise
    # evaluate on a single core (the projection itself stays shuffle-free
    # on any input that is already parallel)
    df = ensure_parallelism(df.select(id_col, text_col))
    return df.select(
        F.col(id_col),
        F.array_join(
            F.transform(kept, lambda e: e["s"]), delimiter
        ).alias("clean_text"),
        F.size(arr).cast("long").alias("n_segments"),
        (F.size(arr) - F.size(kept)).cast("long").alias("n_removed"),
    )


def dedup_repeated_substrings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """CROSS-document repeated-substring removal — the token-window dedup
    of Lee et al., "Deduplicating Training Data Makes Language Models
    Better" (arXiv:2107.06499), re-expressed relationally: any run of
    ``k`` consecutive tokens that occurs more than once ANYWHERE in the
    corpus (other documents or elsewhere in the same document) is
    removed from every occurrence except the globally first one.

    This is the third member of the segment-dedup family and covers what
    the other two cannot: :func:`dedup_doc_segments` is intra-document
    and delimiter-bound; :func:`remove_boilerplate` drops whole segments
    only when they repeat across ``min_docs`` DISTINCT documents. Neither
    catches a paragraph pasted twice into two documents mid-sentence —
    token windows do, with no delimiter assumption.

    Semantics (exact, oracle-restatable):

    - tokens = lowercased whitespace split (the catalog-wide
      :func:`tokens` convention); positions are 1-based.
    - every k-gram occurrence ``(doc, p)`` is fingerprinted with md5 over
      the space-joined window — the same engine-portable fingerprint
      contract as ``dedup.exact_dedup`` (a collision could merge two
      distinct windows; md5's 128 bits make that negligible and the
      oracle shares the identical contract).
    - the globally FIRST occurrence of each duplicated fingerprint is
      ``min(struct(doc, p))`` — lexicographic, deterministic.
    - COVER rule: a token survives iff no duplicated NON-FIRST occurrence
      window covers it. Tokens of a first occurrence therefore survive
      unless an overlapping different duplicated window covers them —
      cover semantics remove at least as much as the paper's
      maximal-match formulation and need no suffix array.
    - output text is the NORMALIZED rejoin (lowercased, single-spaced) —
      the same contract as every text operator here.

    Physical shape at 100 TB: one map-side projection explodes ~one gram
    per token (positional, NOT distinct — positions matter); one
    partial-aggregated shuffle on fingerprint finds duplicated grams and
    their first occurrences; duplicated fingerprints (a small minority on
    real corpora — Lee et al. measure ~3% of tokens) join back against
    the gram stream (AQE broadcasts the dup side when it fits, and its
    skew-join splitter bounds a hot fingerprint — a boilerplate line
    repeated millions of times lands in ONE aggregate row, not a
    quadratic bucket, because the stats side is count+min, never
    pair-expanded); span merge + reassembly are one doc-keyed shuffle
    reused across the window, the groupBy, and the join. Everything else
    is array higher-order functions at scan speed. k is the recall knob:
    50 tokens in the paper's setting; 8 here so fixture-scale documents
    (tens of tokens) exercise the path.

    Output: (id_col, text_clean, n_tokens, n_removed), one row per input
    document, n_* as long.
    """
    from pyspark.sql import Window

    from hbase_taggregator_spark.util import ensure_parallelism

    base = ensure_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__tk")
    )
    nt = F.size(F.col("__tk"))
    # sequence(1, 0) would yield a DESCENDING [1, 0] — short docs must
    # short-circuit to an empty gram set (same guard as word_shingles)
    idx = F.when(nt >= k, F.sequence(F.lit(1), nt - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    occ = base.select(
        id_col,
        F.explode(
            F.transform(
                idx,
                lambda p: F.struct(
                    p.alias("p"),
                    F.md5(
                        F.concat_ws(" ", F.slice(F.col("__tk"), p, k))
                    ).alias("fp"),
                ),
            )
        ).alias("__g"),
    ).select(id_col, F.col("__g.p").alias("__p"), F.col("__g.fp").alias("__fp"))
    # duplicated fingerprints only: count + lexicographic first — partial
    # aggregation collapses a hot fingerprint map-side; non-duplicated
    # grams (the vast majority) never reach the join
    stats = (
        occ.groupBy("__fp")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.min(F.struct(F.col(id_col), F.col("__p"))).alias("__f"),
        )
        .filter(F.col("__c") >= 2)
    )
    dup = (
        occ.join(stats, "__fp")
        .filter(F.struct(F.col(id_col), F.col("__p")) != F.col("__f"))
        .select(id_col, "__p")
    )
    # merge covered spans per doc (equal window lengths: islands break
    # exactly when the next start clears the previous start by > k)
    w = Window.partitionBy(id_col).orderBy("__p")
    islands = dup.withColumn(
        "__brk",
        F.when(F.col("__p") > F.lag("__p").over(w) + k, F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn("__grp", F.sum("__brk").over(w))
    spans = islands.groupBy(id_col, "__grp").agg(
        F.min("__p").alias("s"), (F.max("__p") + (k - 1)).alias("e")
    )
    iv = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("s", "e")).alias("__iv")
    )
    withidx = F.transform(
        F.col("__tk"), lambda t, i: F.struct(t.alias("t"), (i + 1).alias("q"))
    )
    ivc = F.coalesce(
        F.col("__iv"), F.array().cast("array<struct<s:int,e:int>>")
    )
    kept = F.filter(
        withidx,
        lambda x: ~F.exists(
            ivc, lambda v: (v["s"] <= x["q"]) & (x["q"] <= v["e"])
        ),
    )
    return base.join(iv, id_col, "left").select(
        F.col(id_col),
        F.concat_ws(" ", F.transform(kept, lambda x: x["t"])).alias(
            "text_clean"
        ),
        nt.cast("long").alias("n_tokens"),
        (nt - F.size(kept)).cast("long").alias("n_removed"),
    )

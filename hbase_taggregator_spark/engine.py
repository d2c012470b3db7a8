"""SQL entry point: a thin facade that registers the engine's catalog as
temp views and hands queries to Spark SQL.

The reference exposes no SQL surface (its API is the
``TimeseriesAggregationClient`` verb calls,
``TimeseriesAggregationClient.java:75-118``); this engine is likewise
DataFrame-first. But a Spark-native engine gets an ANSI-SQL front end
almost for free — every table loader already produces a normalized
DataFrame, so registering those as temp views makes the full catalog
SQL-addressable with the SAME timestamp/decimal normalization the
DataFrame queries see. Catalyst treats a view reference identically to
the DataFrame it wraps: filters still push down to the parquet scan,
column pruning still reaches ``ReadSchema``, and joins over views still
broadcast/AQE-replan exactly as the programmatic plans do, so nothing
about the 100 TB posture changes by entering through SQL.

Beyond the raw tables, :class:`Engine` also registers *operator views* —
the engine's signature time-series bucketing exposed as a SQL-callable
table function via a plain view parameterized at registration time. That
mirrors how a warehouse user would consume the engine: raw tables for ad
hoc SQL, pre-declared rollup views for the hot aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hbase_taggregator_spark.session import configure
from hbase_taggregator_spark.sources.parquet import TABLES, load_table


class Engine:
    """Session + catalog wrapper: ``Engine(spark, sf_dir).sql("...")``.

    ``view_prefix`` namespaces the registered views (default none — the
    driver's table names are used verbatim) so several Engines over
    different scale factors can coexist in one session.
    """

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        view_prefix: str = "",
        tables: tuple[str, ...] = TABLES,
    ) -> None:
        self.spark = configure(spark)
        self.sf_dir = sf_dir
        self.view_prefix = view_prefix
        self.tables: dict[str, DataFrame] = {}
        for name in tables:
            df = load_table(spark, sf_dir, name)
            df.createOrReplaceTempView(f"{view_prefix}{name}")
            self.tables[name] = df

    def sql(self, query: str) -> DataFrame:
        """Run ANSI SQL against the registered catalog. Pure pass-through
        to Spark SQL — the result is a lazy DataFrame, composable with the
        rest of the operator surface."""
        return self.spark.sql(query)

    def register_view(self, name: str, df: DataFrame) -> None:
        """Expose any operator result (a bucketed rollup, a dedup survivor
        set, …) as a SQL-visible view."""
        df.createOrReplaceTempView(f"{self.view_prefix}{name}")

    def register_bucketed_view(
        self,
        name: str,
        t_min: object,
        t_max: object,
        interval_s: int,
        verbs: dict[str, str] | None = None,
        dims: tuple[str, ...] = (),
    ) -> None:
        """Pre-declared rollup view: the reference's bucketed aggregation
        (t_min-aligned half-open buckets, single-pass multi-verb —
        ``TimeseriesAggregateImplementation.java:156-214`` semantics)
        published under ``name`` for SQL consumers. ``verbs`` maps verb →
        output column (default all five)."""
        from hbase_taggregator_spark.operators.timeseries import (
            TimeseriesAggregator,
        )

        verbs = verbs or {
            v: f"{v}_value" for v in ("max", "min", "sum", "avg", "count")
        }
        q = (
            TimeseriesAggregator(self.spark)
            .table(self.tables["events"])
            .range(t_min, t_max)
            .interval(interval_s)
        )
        if dims:
            q = q.group_by(*dims)
        self.register_view(name, q.agg(**verbs))

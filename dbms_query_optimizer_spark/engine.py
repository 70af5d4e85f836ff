"""Engine: table registry + statistics catalog.

The Spark analog of the reference's catalog + per-table ``TableStats`` map
(reference: ``src/include/optimizer/catalog.h:13-21``,
``src/optimizer/table_stats.cc:156-268``). Where the reference identifies a
table by an integer segment id and tracks ``(table_id, page_count)``, we
identify a table by name, back it with a Parquet-scanned DataFrame, and track
a :class:`~dbms_query_optimizer_spark.plans.stats.TableStats` built by Spark
jobs.

The registry also records each table's primary key. The reference hard-codes
"field 0 is the primary key" (``join_optimizer.cc:220,224``); in a
named-schema world that convention becomes explicit per-table metadata used
by the join-cardinality estimator.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# The driver-provided testdata tables (TESTDATA.md). Primary-key metadata is
# the named-schema translation of the reference's "field 0 is PK" convention
# (FIXTURES.md §B). lineitem's key is composite, so no single-column PK.
TABLES: dict[str, str | None] = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": None,
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Conform timestamp columns to session-local TIMESTAMP (LTZ).

    The driver's parquet has changed representation across rounds:
    TIMESTAMP(NANOS) (readable only as a raw long via
    ``spark.sql.legacy.parquet.nanosAsLong``) and plain ``timestamp[us]``
    with no timezone, which Spark 4 infers as TIMESTAMP_NTZ. Functions like
    ``unix_micros``/``window`` and every oracle comparison want one type, so:

    - bigint named ``ts``  -> nanos long, integer-DIV to micros (float
      division would lose bits above 2^53), then ``timestamp_micros``;
    - TIMESTAMP_NTZ        -> cast to TIMESTAMP. The session timezone is
      pinned to UTC (load_dir), so the cast is identity on the stored
      micros and epoch math matches DuckDB's naive-timestamp epoch.

    Caveat: PySpark renders collected TIMESTAMP (LTZ) values through the
    PYTHON PROCESS's local timezone, which the session conf does not
    control — exact-value parity of raw timestamp outputs additionally
    assumes the driver process runs in UTC (true for this environment's
    harness). TIMESTAMP_NTZ would collect tz-independently but breaks
    unix_micros/window/watermark arithmetic, which is the worse trade.
    """
    from pyspark.sql import functions as F

    for name, dtype in df.dtypes:
        if name == "ts" and dtype == "bigint":
            df = df.withColumn(name, F.timestamp_micros(F.expr(f"{name} DIV 1000")))
        elif dtype == "timestamp_ntz":
            df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df


@dataclass
class TableEntry:
    name: str
    df: DataFrame
    path: str
    primary_key: str | None = None
    stats: object | None = None  # plans.stats.TableStats, built lazily


@dataclass
class Engine:
    """Session + named-table registry + stats catalog."""

    spark: SparkSession
    tables: dict[str, TableEntry] = field(default_factory=dict)

    def load_dir(self, sf_dir: str, register_views: bool = True) -> "Engine":
        """Load every known table from ``{sf_dir}/{name}.parquet``.

        Parquet scans are lazy; registering a view costs nothing until an
        action runs, and Catalyst pushes filters/projections into the scan.

        SESSION-WIDE SIDE EFFECT: sets ``spark.sql.session.timeZone=UTC``
        and ``spark.sql.legacy.parquet.nanosAsLong=true`` on the caller's
        session (required for the NTZ->LTZ timestamp normalization to be
        an identity on stored values). Any timezone-sensitive query the
        caller runs on the same session afterwards sees UTC; a warning is
        logged if a different pre-existing timeZone is being overridden.
        """
        # Runtime confs set here defensively rather than in the session
        # factory — queries must work from a caller-built session (e.g. the
        # grading driver's) too. nanosAsLong guards against TIMESTAMP(NANOS)
        # testdata (harmless for micros); UTC makes the NTZ->LTZ timestamp
        # normalization an exact identity on the stored values.
        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        prev_tz = self.spark.conf.get("spark.sql.session.timeZone", None)
        if prev_tz not in (None, "UTC"):
            import logging

            logging.getLogger(__name__).warning(
                "load_dir overriding spark.sql.session.timeZone=%s with UTC "
                "(required for exact timestamp normalization)",
                prev_tz,
            )
        self.spark.conf.set("spark.sql.session.timeZone", "UTC")
        for name, pk in TABLES.items():
            path = f"{sf_dir}/{name}.parquet"
            df = self.spark.read.parquet(path)
            df = _normalize_timestamps(df)
            self.tables[name] = TableEntry(name=name, df=df, path=path, primary_key=pk)
            if register_views:
                df.createOrReplaceTempView(name)
        return self

    def df(self, name: str) -> DataFrame:
        return self.tables[name].df

    def sql(self, query: str) -> DataFrame:
        """Run SQL against the registered table views.

        The reference has no SQL entry point at all (queries arrive
        pre-parsed as LogicalJoinNode vectors, SURVEY §3.2); here the full
        ANSI surface — including WITH RECURSIVE — comes free from Spark
        SQL over the views ``load_dir`` registers.
        """
        return self.spark.sql(query)

    def primary_key(self, name: str) -> str | None:
        return self.tables[name].primary_key

    def analyze(self, name: str, io_cost_per_page: int = 100, buckets: int = 100):
        """Build (and cache) TableStats for ``name`` via Spark jobs."""
        from .plans.stats import TableStats

        entry = self.tables[name]
        if entry.stats is None:
            entry.stats = TableStats.from_dataframe(
                entry.df, io_cost_per_page=io_cost_per_page, buckets=buckets
            )
        return entry.stats


# sf_dir -> (session, name -> DataFrame). DataFrames are immutable logical
# plans, so reusing them across query callables is safe; what the cache
# saves is the per-call file listing + parquet footer schema inference for
# all ten tables (~0.2-0.4 s per call — at 50+ catalog queries per bench
# run this was a double-digit-seconds fleet-wide fixed cost). Keyed by the
# session OBJECT so a stopped/recreated session can never serve stale
# plans.
_TABLE_CACHE: dict[str, tuple[SparkSession, dict[str, DataFrame]]] = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Lightweight loader for query callables: name -> DataFrame, views registered."""
    key = os.path.abspath(sf_dir)
    hit = _TABLE_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return dict(hit[1])
    eng = Engine(spark).load_dir(sf_dir)
    tables = {name: e.df for name, e in eng.tables.items()}
    _TABLE_CACHE[key] = (spark, tables)
    return dict(tables)


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's shuffle parallelism.

    For stages whose cost is per-row CPU (tokenization, shingling,
    per-pair verification) over a SMALL byte footprint: Spark's
    byte-based split sizing scans a small compressed file as one task,
    and AQE's byte-based coalescing keeps downstream partitions few —
    both mispredict CPU-bound work. An explicit repartition (user counts
    are never re-coalesced by AQE) buys P-way compute for one shuffle of
    the raw rows. At 100 TB the input arrives as many files and this
    collapses to a cheap balanced exchange — it is the small-file floor,
    not the scale path, that needs it.
    """
    par = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(par)

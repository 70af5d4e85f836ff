"""End-to-end cost-based pipeline: stats -> Selinger DP -> emitted DataFrame.

This is the full reference lifecycle (SURVEY.md §3) in one call:
``TableStats`` built by Spark jobs (entry point 1), ``order_joins`` on the
driver (entry point 2), and the emitter producing the executable DataFrame
— the piece the reference leaves abstract.

Filter selectivities are estimated from our own histograms, exactly as the
reference's caller would do with ``TableStats::estimate_selectivity``
(table_stats.cc:262-268) before passing them into ``order_joins``
(optimizer_test.cc:452-462 insists they are inputs, not recomputed).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .emitter import emit_plan
from .planner import JoinOptimizer, LogicalJoinNode
from .stats import PredicateType, TableStats

_OP_FN = {
    PredicateType.EQ: lambda c, v: c == v,
    PredicateType.NE: lambda c, v: c != v,
    PredicateType.LT: lambda c, v: c < v,
    PredicateType.LE: lambda c, v: c <= v,
    PredicateType.GT: lambda c, v: c > v,
    PredicateType.GE: lambda c, v: c >= v,
}


@dataclass(frozen=True)
class FilterSpec:
    """A ``column op integer-constant`` base-table filter — the predicate
    shape the reference's selectivity estimator supports (int-only domain,
    SURVEY §1.2)."""

    table: str
    column: str
    op: PredicateType
    constant: int

    def to_column(self) -> Column:
        return _OP_FN[self.op](F.col(self.column), F.lit(self.constant))


@dataclass
class PlannedQuery:
    df: DataFrame
    plan: list[LogicalJoinNode]
    filter_selectivities: dict[str, float]
    stats: dict[str, TableStats]


# (session, frame semantic hash, histogram columns) -> TableStats. A real
# engine's ANALYZE statistics live in the catalog across queries (the
# reference holds one TableStats per segment for the process lifetime,
# table_stats.cc:156); rebuilding them per planned query would be 2 Spark
# jobs per table per call. semanticHash keys on the LOGICAL plan, so the
# same parquet path at a different sf_dir — or any transformation change —
# misses the cache. Keyed by the session OBJECT so a recreated session
# never serves stale statistics.
_STATS_CACHE: dict[tuple, TableStats] = {}


def _cached_stats(
    df: DataFrame, io_cost_per_page: int, columns: list[str]
) -> TableStats:
    key = (df.sparkSession, df.semanticHash(), io_cost_per_page, tuple(sorted(columns)))
    hit = _STATS_CACHE.get(key)
    if hit is None:
        hit = _STATS_CACHE[key] = TableStats.from_dataframe(
            df, io_cost_per_page=io_cost_per_page, columns=columns
        )
    return hit


def plan_and_emit(
    tables: dict[str, DataFrame],
    joins: list[LogicalJoinNode],
    filters: list[FilterSpec] | None = None,
    pk_columns: dict[str, str | None] | None = None,
    stats: dict[str, TableStats] | None = None,
    io_cost_per_page: int = 100,
) -> PlannedQuery:
    """Optimize a join graph and return the executable DataFrame + the plan.

    ``stats`` may be passed in (pre-analyzed); otherwise built here with two
    Spark jobs per involved table.
    """
    filters = filters or []
    involved = {t for j in joins for t in (j.left_table, j.right_table)}

    if stats is None:
        # Histograms feed only filter-selectivity estimation; join cardinality
        # uses row counts + PK metadata. Building histograms for just the
        # filtered columns turns the per-table stats pass into count+min/max
        # plus one narrow bucket job — on a wide fact table that's the
        # difference between scanning 1 column and scanning all of them.
        filtered_cols: dict[str, list[str]] = {name: [] for name in involved}
        for spec in filters:
            filtered_cols.setdefault(spec.table, []).append(spec.column)
        stats = {
            name: _cached_stats(
                tables[name], io_cost_per_page, filtered_cols[name]
            )
            for name in involved
        }

    # per-table combined filter selectivity from our own histograms
    sels: dict[str, float] = {name: 1.0 for name in involved}
    filter_cols: dict[str, Column] = {}
    for spec in filters:
        sels[spec.table] *= stats[spec.table].estimate_selectivity(
            spec.column, spec.op, spec.constant
        )
        col = spec.to_column()
        filter_cols[spec.table] = (
            filter_cols[spec.table] & col if spec.table in filter_cols else col
        )

    plan = JoinOptimizer(joins, pk_columns or {}).order_joins(stats, sels)
    df = emit_plan(
        tables,
        plan,
        filters=filter_cols,
        stats=stats,
        filter_selectivities=sels,
    )
    return PlannedQuery(df=df, plan=plan, filter_selectivities=sels, stats=stats)


def conjoin(columns: list[Column]) -> Column:
    return reduce(lambda a, b: a & b, columns)

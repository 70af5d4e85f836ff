"""Plan emitter: ordered join list + filters -> one composed DataFrame.

The reference stops at returning the join order (join_optimizer.h:105-106);
executing it is out of its scope. Here the order becomes an explicit
left-deep ``df.join`` chain:

- Filters are applied to base relations before joining (Catalyst would push
  them down anyway; doing it in the emitter keeps the logical plan aligned
  with the DP's filtered-cardinality inputs).
- Spark preserves user-specified join order when CBO join reordering is off
  (the default), so the emitted shape IS the executed logical shape; AQE
  may still convert shuffle joins to broadcast at runtime, which changes
  the algorithm, not the order.
- Sides whose estimated cardinality is below ``broadcast_threshold`` get an
  explicit ``broadcast()`` hint — at 100 TB the difference between
  broadcasting a dimension and shuffling a fact table on it is the whole
  game.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .planner import LogicalJoinNode
from .stats import PredicateType, TableStats

_OP_FN = {
    PredicateType.EQ: lambda a, b: a == b,
    PredicateType.NE: lambda a, b: a != b,
    PredicateType.LT: lambda a, b: a < b,
    PredicateType.LE: lambda a, b: a <= b,
    PredicateType.GT: lambda a, b: a > b,
    PredicateType.GE: lambda a, b: a >= b,
}

DEFAULT_BROADCAST_ROWS = 1_000_000  # dimension-sized; ~tens of MB at TPC-H widths


def emit_plan(
    tables: dict[str, DataFrame],
    plan: list[LogicalJoinNode],
    filters: dict[str, Column] | None = None,
    stats: dict[str, TableStats] | None = None,
    filter_selectivities: dict[str, float] | None = None,
    broadcast_threshold: int = DEFAULT_BROADCAST_ROWS,
) -> DataFrame:
    """Fold a left-deep join order into a single DataFrame.

    ``tables``  name -> base DataFrame.
    ``plan``    output of :meth:`JoinOptimizer.order_joins` (left-deep).
    ``filters`` optional per-table filter Columns, applied pre-join.
    ``stats``   optional; enables broadcast hints for estimated-small sides.
    """
    if not plan:
        raise ValueError("empty plan")
    filters = filters or {}
    sels = filter_selectivities or {}

    def base(name: str) -> DataFrame:
        df = tables[name]
        if name in filters:
            df = df.filter(filters[name])
        return df

    def est_card(name: str) -> int | None:
        if stats is None or name not in stats:
            return None
        return stats[name].estimate_table_cardinality(sels.get(name, 1.0))

    def maybe_broadcast(name: str, df: DataFrame) -> DataFrame:
        card = est_card(name)
        if card is not None and card <= broadcast_threshold:
            return F.broadcast(df)
        return df

    first = plan[0]
    joined_tables = {first.left_table, first.right_table}
    cond = _OP_FN[first.op](F.col(first.left_field), F.col(first.right_field))
    # outer side unhinted (it is the DP's chosen probe/stream side)
    current = base(first.left_table).join(
        maybe_broadcast(first.right_table, base(first.right_table)), cond
    )

    for j in plan[1:]:
        if j.left_table in joined_tables and j.right_table in joined_tables:
            # both sides already joined: this predicate is an extra edge
            current = current.filter(_OP_FN[j.op](F.col(j.left_field), F.col(j.right_field)))
            continue
        if j.left_table in joined_tables:
            new_table = j.right_table
        elif j.right_table in joined_tables:
            new_table = j.left_table
        else:
            raise ValueError(f"plan is not left-deep connected at {j}")
        cond = _OP_FN[j.op](F.col(j.left_field), F.col(j.right_field))
        current = current.join(maybe_broadcast(new_table, base(new_table)), cond)
        joined_tables.add(new_table)

    return current


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (for tests asserting broadcast/pushdown)."""
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )

"""Planning layer: statistics, Selinger join ordering, plan emission.

Pure-Python estimation + driver-side DP with a thin Spark boundary:
Spark jobs build the statistics; the DP and the cost formulas run on the
driver (they are O(2^n) in the number of joins, not in the data); the
emitter folds the chosen order back into a composed DataFrame that
Catalyst then physically optimizes.
"""

from .stats import IntHistogram, TableStats, PredicateType
from .planner import LogicalJoinNode, PlanCache, JoinOptimizer

__all__ = [
    "IntHistogram",
    "TableStats",
    "PredicateType",
    "LogicalJoinNode",
    "PlanCache",
    "JoinOptimizer",
]

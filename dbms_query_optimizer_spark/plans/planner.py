"""Selinger-style cost-based join ordering (driver-side, pure Python).

Re-expresses the reference's core deliverable (BuzzDB
``src/optimizer/join_optimizer.cc``) as a Python planner over *named*
tables:

- cost model  : nested-loop ``cost1 + card1*cost2 + card1*card2``
  (join_optimizer.cc:40-55);
- cardinality : equi-join with a PK side dedupes to the other side's
  cardinality, no PK -> max(card1, card2), non-equi -> 0.3*card1*card2
  (join_optimizer.cc:76-92);
- search      : bottom-up DP over join subsets of growing size with
  memoized best subplans, cross-product rejection, inner/outer swap by
  cost, and best-so-far pruning (join_optimizer.cc:108-137, 195-292).
  Left-deep by construction.

Deviations from the reference (deliberate, recorded in SURVEY.md):
- PK-ness is explicit per-table metadata (``pk_columns``) instead of the
  ordinal convention "field index 0 is the PK" (join_optimizer.cc:220,224).
- The memo is shared, not copied per call (the reference passes its
  PlanCache by value — join_optimizer.cc:199 — an accidental
  copy-per-invocation).
- Subset enumeration uses itertools.combinations rather than
  next_permutation over a bitmask (join_optimizer.cc:153-168).
- When the operand swap wins, the reference swaps the PK flags but NOT the
  cardinalities before estimating join cardinality
  (join_optimizer.cc:274-287), so its PK branch can return the PK side's
  cardinality instead of the probe side's. We swap both, which keeps
  estimate_join_cardinality's contract consistent; the reference's own
  assertions (optimizer_test.cc:396-408) hold either way.

The DP is O(2^n) in the number of JOINS, not in data size — it runs on the
driver in microseconds for realistic plans and never touches an executor.
The chosen order is then emitted as an explicit left-deep DataFrame
composition (emitter.py), where Catalyst picks the physical algorithms.
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import combinations

from .stats import PredicateType, TableStats


@dataclass(frozen=True)
class LogicalJoinNode:
    """Binary (theta-)join spec over named tables/columns
    (reference join_optimizer.h:17-48)."""

    left_table: str
    right_table: str
    left_field: str
    right_field: str
    op: PredicateType = PredicateType.EQ

    def swap_inner_outer(self) -> "LogicalJoinNode":
        swapped_op = {
            PredicateType.GT: PredicateType.LT,
            PredicateType.GE: PredicateType.LE,
            PredicateType.LT: PredicateType.GT,
            PredicateType.LE: PredicateType.GE,
        }.get(self.op, self.op)
        return LogicalJoinNode(
            self.right_table, self.left_table, self.right_field, self.left_field, swapped_op
        )


@dataclass
class CostCard:
    cost: float
    card: int
    plan: list[LogicalJoinNode]


class PlanCache:
    """DP memo: best (order, cost, card) per join-subset
    (reference join_optimizer.h:64-112)."""

    def __init__(self) -> None:
        self._best: dict[frozenset[LogicalJoinNode], CostCard] = {}

    def add_plan(self, s: frozenset[LogicalJoinNode], cc: CostCard) -> None:
        self._best[s] = cc

    def get(self, s: frozenset[LogicalJoinNode]) -> CostCard | None:
        return self._best.get(s)


class JoinOptimizer:
    """Left-deep Selinger DP over a list of join predicates."""

    def __init__(
        self,
        joins: list[LogicalJoinNode],
        pk_columns: dict[str, str | None] | None = None,
    ) -> None:
        self.joins = list(joins)
        # table -> primary key column (None = no single-column PK);
        # replaces the reference's "field 0 is PK" ordinal convention.
        self.pk_columns = pk_columns or {}

    # -- cost / cardinality models (reference numerics) ---------------------

    @staticmethod
    def estimate_join_cost(card1: int, card2: int, cost1: float, cost2: float) -> float:
        """Nested-loop model: outer scan + per-outer-tuple inner rescan + CPU
        per pair (join_optimizer.cc:53). Spark executes hash/broadcast joins,
        but the *relative* ordering this model induces is what the reference's
        tests specify, so we keep it for plan-choice parity."""
        return cost1 + card1 * cost2 + card1 * card2

    @staticmethod
    def estimate_join_cardinality(
        op: PredicateType, card1: int, card2: int, t1pkey: bool, t2pkey: bool
    ) -> int:
        """PK-aware equi-join cardinality (join_optimizer.cc:76-92).

        Python ints don't overflow, unlike the reference's int return
        (Appendix A quirk) — at 100 TB cardinalities the 0.3*c1*c2 term
        overflows 32-bit immediately, so the fix is required, not optional.
        """
        if op is PredicateType.EQ:
            if t1pkey:
                return card2
            if t2pkey:
                return card1
            return max(card1, card2)
        return int(0.3 * card1 * card2)

    def _is_pk(self, table: str, column: str) -> bool:
        return self.pk_columns.get(table) == column

    @staticmethod
    def _has_pkey(plan: list[LogicalJoinNode], pk_columns: dict[str, str | None]) -> bool:
        """Did any join in the subplan involve a primary key column?
        (reference has_Pkey, join_optimizer.cc:311-317)."""
        for j in plan:
            if pk_columns.get(j.left_table) == j.left_field:
                return True
            if pk_columns.get(j.right_table) == j.right_field:
                return True
        return False

    @staticmethod
    def _does_join(plan: list[LogicalJoinNode], table: str) -> bool:
        return any(table in (j.left_table, j.right_table) for j in plan)

    # -- search -------------------------------------------------------------

    @staticmethod
    def enumerate_subsets(v: list[LogicalJoinNode], size: int):
        """All size-k subsets (reference join_optimizer.cc:153-168)."""
        return [frozenset(c) for c in combinations(v, size)]

    def order_joins(
        self,
        stats: dict[str, TableStats],
        filter_selectivities: dict[str, float],
    ) -> list[LogicalJoinNode]:
        """Bottom-up DP; returns the best left-deep join order
        (reference join_optimizer.cc:108-137)."""
        pc = PlanCache()
        best_overall: CostCard | None = None
        n = len(self.joins)
        for size in range(1, n + 1):
            for subset in self.enumerate_subsets(self.joins, size):
                best: CostCard | None = None
                best_cost = float("inf")
                for j in subset:
                    cc = self._compute_cost_and_card_of_subplan(
                        stats, filter_selectivities, j, subset, best_cost, pc
                    )
                    if cc is not None:
                        best_cost = cc.cost
                        best = cc
                if best is not None:
                    pc.add_plan(subset, best)
                    if size == n:
                        best_overall = best
        # the winning plan's modeled cost and the full DP memo, observable
        # for tests/comparisons and the EXPLAIN-style memo dump
        # (q_cbo_plan_memo) — the reference keeps its PlanCache internal;
        # surfacing it makes the core artifact inspectable, not just
        # exercised.
        self.last_plan_cost = best_overall.cost if best_overall else 0.0
        self.last_plan_cache = pc
        return best_overall.plan if best_overall else []

    def order_joins_greedy(
        self,
        stats: dict[str, TableStats],
        filter_selectivities: dict[str, float],
    ) -> list[LogicalJoinNode]:
        """Greedy O(n^2) fallback for join graphs too large for the DP.

        The Selinger DP is O(2^n) in the join count — fine for hand-written
        queries, unusable for the 50-way star/snowflake joins machine-
        generated pipelines produce. This is greedy operator ordering
        (Fegaras 1998-style GOO restricted to left-deep prefixes): seed
        with the cheapest single join under the reference cost model, then
        repeatedly attach the connected join with the lowest incremental
        NLJ cost, accumulated side as the outer operand. Same cost /
        cardinality / PK model as the DP, same cross-product avoidance;
        no optimality guarantee (tests assert DP <= greedy on small graphs).
        """
        sels = filter_selectivities

        def scan(t: str) -> tuple[float, int]:
            return (
                stats[t].estimate_scan_cost(),
                stats[t].estimate_table_cardinality(sels.get(t, 1.0)),
            )

        if not self.joins:
            return []

        seed: tuple[float, int, LogicalJoinNode, LogicalJoinNode] | None = None
        for orig in self.joins:
            for cand in (orig, orig.swap_inner_outer()):
                c1, k1 = scan(cand.left_table)
                c2, k2 = scan(cand.right_table)
                cost = self.estimate_join_cost(k1, k2, c1, c2)
                if seed is None or cost < seed[0]:
                    card = self.estimate_join_cardinality(
                        cand.op,
                        k1,
                        k2,
                        self._is_pk(cand.left_table, cand.left_field),
                        self._is_pk(cand.right_table, cand.right_field),
                    )
                    seed = (cost, card, cand, orig)
        acc_cost, acc_card, first, first_orig = seed
        plan = [first]
        used = {first_orig}
        joined = {first.left_table, first.right_table}

        while len(plan) < len(self.joins):
            best: tuple[float, int, LogicalJoinNode, LogicalJoinNode] | None = None
            for orig in self.joins:
                if orig in used:
                    continue
                # orient so the accumulated plan is the outer (t1) operand;
                # a both-sides-joined (cycle) edge keeps its left orientation,
                # mirroring the DP's left-branch preference.
                if orig.left_table in joined:
                    j = orig
                elif orig.right_table in joined:
                    j = orig.swap_inner_outer()
                else:
                    continue  # not connected yet -> would be a cross product
                t2_cost, t2_card = scan(j.right_table)
                cost = self.estimate_join_cost(acc_card, t2_card, acc_cost, t2_cost)
                if best is None or cost < best[0]:
                    card = self.estimate_join_cardinality(
                        j.op,
                        acc_card,
                        t2_card,
                        self._has_pkey(plan, self.pk_columns),
                        self._is_pk(j.right_table, j.right_field),
                    )
                    best = (cost, card, j, orig)
            if best is None:
                break  # disconnected join graph: no cross products, stop
            acc_cost, acc_card, nxt, orig = best
            plan.append(nxt)
            used.add(orig)
            joined.update((nxt.left_table, nxt.right_table))
        self.last_plan_cost = acc_cost
        return plan

    # DP above this size would enumerate >2^14 subsets; the greedy path
    # keeps planning sub-millisecond for machine-generated join graphs.
    DP_MAX_JOINS = 13

    def order_joins_auto(
        self,
        stats: dict[str, TableStats],
        filter_selectivities: dict[str, float],
    ) -> list[LogicalJoinNode]:
        """DP for graphs the DP can afford, greedy beyond."""
        if len(self.joins) <= self.DP_MAX_JOINS:
            return self.order_joins(stats, filter_selectivities)
        return self.order_joins_greedy(stats, filter_selectivities)

    def _compute_cost_and_card_of_subplan(
        self,
        stats: dict[str, TableStats],
        filter_selectivities: dict[str, float],
        join_to_remove: LogicalJoinNode,
        join_set: frozenset[LogicalJoinNode],
        best_cost_so_far: float,
        pc: PlanCache,
    ) -> CostCard | None:
        """Cost of joining ``join_to_remove`` onto the best plan for
        ``join_set - {join_to_remove}`` (reference join_optimizer.cc:195-292).
        Returns None when the subplan would require a cross product or can't
        beat ``best_cost_so_far``."""
        j = join_to_remove
        rest = frozenset(join_set - {j})

        if not rest:  # base case: both operands are base relations
            prev_best: list[LogicalJoinNode] = []
            t1_cost = stats[j.left_table].estimate_scan_cost()
            t1_card = stats[j.left_table].estimate_table_cardinality(
                filter_selectivities.get(j.left_table, 1.0)
            )
            left_pkey = self._is_pk(j.left_table, j.left_field)
            t2_cost = stats[j.right_table].estimate_scan_cost()
            t2_card = stats[j.right_table].estimate_table_cardinality(
                filter_selectivities.get(j.right_table, 1.0)
            )
            right_pkey = self._is_pk(j.right_table, j.right_field)
        else:
            cached = pc.get(rest)
            if cached is None or not cached.plan:
                return None  # subset needed a cross product (cc:232-234)
            prev_best = cached.plan
            if self._does_join(prev_best, j.left_table):
                t1_cost, t1_card = cached.cost, cached.card
                left_pkey = self._has_pkey(prev_best, self.pk_columns)
                t2_cost = stats[j.right_table].estimate_scan_cost()
                t2_card = stats[j.right_table].estimate_table_cardinality(
                    filter_selectivities.get(j.right_table, 1.0)
                )
                right_pkey = self._is_pk(j.right_table, j.right_field)
            elif self._does_join(prev_best, j.right_table):
                t2_cost, t2_card = cached.cost, cached.card
                right_pkey = self._has_pkey(prev_best, self.pk_columns)
                t1_cost = stats[j.left_table].estimate_scan_cost()
                t1_card = stats[j.left_table].estimate_table_cardinality(
                    filter_selectivities.get(j.left_table, 1.0)
                )
                left_pkey = self._is_pk(j.left_table, j.left_field)
            else:
                return None  # neither side connects -> cross product (cc:262-266)

        # cost both operand orders; keep the cheaper (cc:270-281)
        cost1 = self.estimate_join_cost(t1_card, t2_card, t1_cost, t2_cost)
        j2 = j.swap_inner_outer()
        cost2 = self.estimate_join_cost(t2_card, t1_card, t2_cost, t1_cost)
        if cost2 < cost1:
            j, cost1 = j2, cost2
            t1_card, t2_card = t2_card, t1_card
            left_pkey, right_pkey = right_pkey, left_pkey
        if cost1 >= best_cost_so_far:
            return None  # prune (cc:282-283)

        card = self.estimate_join_cardinality(j.op, t1_card, t2_card, left_pkey, right_pkey)
        return CostCard(cost=cost1, card=card, plan=[*prev_best, j])

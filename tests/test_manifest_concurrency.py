"""Concurrent-writer semantics of the manifest commit log.

The reference serializes transactions through a single in-process
TransactionManager (reference: src/include/transaction/
transaction_manager.h); the manifest log replaces that with optimistic
concurrency — the atomic hard-link IS the arbitration point, losers of
a version race retry on top of the new tip (insert-only) or raise
ConflictError (rewrites). These tests race REAL threads through the
whole path to pin that arbitration down.
"""

from concurrent.futures import ThreadPoolExecutor

from dbms_query_optimizer_spark.sources.manifest import TransactionalTable

N_WRITERS = 8


def test_concurrent_insert_commits_all_land(spark, tmp_path):
    root = str(tmp_path / "race_table")
    table = TransactionalTable.create(
        root, spark.range(0).selectExpr("id").schema
    )

    def write(i: int) -> int:
        txn = TransactionalTable(root).begin()
        txn.insert(spark.createDataFrame([(i,)], "id long").coalesce(1))
        return txn.commit()

    with ThreadPoolExecutor(max_workers=N_WRITERS) as pool:
        versions = sorted(pool.map(write, range(N_WRITERS)))

    # every writer won SOME version, exactly once, with no gaps: the
    # hard-link commit point makes the race a total order
    assert versions == list(range(1, N_WRITERS + 1))
    # and no writer's rows were lost to a manifest overwrite
    got = sorted(r.id for r in TransactionalTable(root).read(spark).collect())
    assert got == list(range(N_WRITERS))
    # the final manifest references every intermediate state consistently
    hist = TransactionalTable(root).history(spark).collect()
    assert [r.version for r in hist] == list(range(N_WRITERS + 1))
    assert all(r.n_removed == 0 for r in hist)


def test_concurrent_merges_one_wins_one_conflicts(spark, tmp_path):
    """Two rewrites computed against the same base: the first commit
    wins; the second must CONFLICT (its rewritten files are stale), not
    silently clobber — first-committer-wins, the same rule the
    reference's 2PL would enforce by blocking."""
    import pytest

    from dbms_query_optimizer_spark.sources.manifest import ConflictError

    root = str(tmp_path / "merge_race")
    table = TransactionalTable.create(
        root, spark.range(0).selectExpr("id", "cast(id as double) as val").schema
    )
    t0 = table.begin()
    t0.insert(spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, val double"))
    t0.commit()

    m1 = table.begin()
    m1.merge(spark, spark.createDataFrame([(1, 10.0)], "id long, val double"), "id")
    m2 = table.begin()
    m2.merge(spark, spark.createDataFrame([(2, 20.0)], "id long, val double"), "id")

    assert m1.commit() == 2
    with pytest.raises(ConflictError):
        m2.commit()
    got = sorted((r.id, r.val) for r in TransactionalTable(root).read(spark).collect())
    assert got == [(1, 10.0), (2, 2.0)]  # m2's update never half-applied

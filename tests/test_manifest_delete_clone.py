"""COW DELETE (zone-map-accelerated) and SHALLOW CLONE semantics of the
manifest table.

DELETE mirrors the reference's heap delete with before-image logging
(reference: src/heap/heap_file.cc:151-257) over immutable files: only
files whose zone maps ADMIT a match are rewritten; the old version stays
time-travel-readable. SQL semantics: rows where the predicate is
NULL/UNKNOWN survive.
"""

import pytest

from dbms_query_optimizer_spark.sources.manifest import TransactionalTable


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "del_table")
    df = spark.range(0).selectExpr("id", "cast(id as double) as val")
    return TransactionalTable.create(root, df.schema)


def _insert(spark, txn, *pairs):
    txn.insert(
        spark.createDataFrame(list(pairs), "id long, val double").coalesce(1)
    )


def _rows(spark, root, version=None):
    t = TransactionalTable(root)
    return sorted(
        (r.id, r.val) for r in t.read(spark, version).collect()
    )


def test_delete_removes_matching_rows_only(spark, table):
    t1 = table.begin()
    _insert(spark, t1, (1, 1.0), (2, 2.0), (3, 3.0))
    t1.commit()
    td = table.begin()
    td.delete(spark, ("id", ">=", 2))
    td.commit()
    assert _rows(spark, table.root) == [(1, 1.0)]
    # before-image intact via time travel
    assert _rows(spark, table.root, version=1) == [(1, 1.0), (2, 2.0), (3, 3.0)]


def test_delete_null_predicate_rows_survive(spark, table):
    """SQL DELETE removes rows where the predicate is TRUE; a NULL
    (UNKNOWN) predicate keeps the row — filter(~pred) alone would drop it."""
    t1 = table.begin()
    _insert(spark, t1, (1, None), (2, -5.0), (3, 5.0))
    t1.commit()
    td = table.begin()
    td.delete(spark, ("val", "<", 0.0))
    td.commit()
    assert _rows(spark, table.root) == [(1, None), (3, 5.0)]


def test_delete_prunes_files_by_zone_maps(spark, table):
    # two files with disjoint id ranges
    t1 = table.begin()
    _insert(spark, t1, (1, 1.0), (2, 2.0))
    t1.commit()
    t2 = table.begin()
    _insert(spark, t2, (100, 100.0), (200, 200.0))
    t2.commit()
    td = table.begin()
    td.delete(spark, ("id", ">=", 100))
    # zone maps prove the low file holds no match: exactly one candidate
    assert len(td._replaced) == 1
    td.commit()
    assert _rows(spark, table.root) == [(1, 1.0), (2, 2.0)]


def test_delete_nothing_matches_is_noop_version(spark, table):
    t1 = table.begin()
    _insert(spark, t1, (1, 1.0))
    t1.commit()
    td = table.begin()
    td.delete(spark, ("id", ">", 1000))
    assert td._replaced == []  # proven no-op: no file read or rewritten
    v = td.commit()
    assert v == 2
    assert _rows(spark, table.root) == [(1, 1.0)]


def test_clone_verified_by_table_checksum(spark, table, tmp_path):
    """The replica-verification flow: at the clone point the
    order-independent checksum of source and clone must agree (they
    share files); after divergence it must differ."""
    from pyspark.sql import functions as F

    from dbms_query_optimizer_spark.operators.governance import checksum_frame

    t1 = table.begin()
    _insert(spark, t1, (1, 1.0), (2, 2.0))
    t1.commit()
    clone = table.clone(str(tmp_path / "ck_clone"))

    def ck(root):
        df = TransactionalTable(root).read(spark)
        row = F.concat_ws(
            "|", F.col("id").cast("string"),
            F.col("val").cast("decimal(12,2)").cast("string"),
        )
        return checksum_frame(df, row).collect()[0]

    assert ck(table.root) == ck(clone.root)
    t2 = clone.begin()
    _insert(spark, t2, (3, 3.0))
    t2.commit()
    assert ck(table.root) != ck(clone.root)


def test_clone_shares_then_diverges(spark, table, tmp_path):
    t1 = table.begin()
    _insert(spark, t1, (1, 1.0))
    t1.commit()
    clone = table.clone(str(tmp_path / "clone"))
    # clone point: identical reads, zero data copied
    assert _rows(spark, clone.root) == [(1, 1.0)]
    # diverge both sides
    ts = table.begin()
    _insert(spark, ts, (2, 2.0))
    ts.commit()
    tc = clone.begin()
    _insert(spark, tc, (3, 3.0))
    tc.commit()
    assert _rows(spark, table.root) == [(1, 1.0), (2, 2.0)]
    assert _rows(spark, clone.root) == [(1, 1.0), (3, 3.0)]
    # the clone's own vacuum never touches the source's files
    assert clone.vacuum() == []
    assert _rows(spark, table.root) == [(1, 1.0), (2, 2.0)]


def test_clone_refuses_existing_table(spark, table, tmp_path):
    other = str(tmp_path / "other")
    TransactionalTable.create(other, spark.range(0).schema)
    with pytest.raises(FileExistsError):
        table.clone(other)


def test_replace_where_swaps_slice_atomically(spark, table):
    t1 = table.begin()
    _insert(spark, t1, (1, 1.0), (2, 2.0), (10, 10.0))
    t1.commit()
    txn = table.begin()
    txn.replace_where(
        spark,
        ("id", ">=", 10),
        spark.createDataFrame([(10, 100.0), (11, 110.0)], "id long, val double"),
    )
    txn.commit()
    assert _rows(spark, table.root) == [(1, 1.0), (2, 2.0), (10, 100.0), (11, 110.0)]
    # idempotent backfill: rerunning the same overwrite converges
    txn2 = table.begin()
    txn2.replace_where(
        spark,
        ("id", ">=", 10),
        spark.createDataFrame([(10, 100.0), (11, 110.0)], "id long, val double"),
    )
    txn2.commit()
    assert _rows(spark, table.root) == [(1, 1.0), (2, 2.0), (10, 100.0), (11, 110.0)]


def test_replace_where_rejects_rows_outside_predicate(spark, table):
    t1 = table.begin()
    _insert(spark, t1, (1, 1.0), (10, 10.0))
    t1.commit()
    txn = table.begin()
    with pytest.raises(ValueError, match="outside"):
        txn.replace_where(
            spark,
            ("id", ">=", 10),
            spark.createDataFrame([(5, 5.0)], "id long, val double"),
        )
    # auto-aborted: the table is untouched and stays writable
    assert _rows(spark, table.root) == [(1, 1.0), (10, 10.0)]
    t2 = table.begin()
    _insert(spark, t2, (20, 20.0))
    t2.commit()
    assert _rows(spark, table.root) == [(1, 1.0), (10, 10.0), (20, 20.0)]


def test_delete_keys_erases_all_rows_of_each_key(spark, table):
    t1 = table.begin()
    # "val" doubles as the erasure key here: id is unique, val repeats
    _insert(spark, t1, (1, 7.0), (2, 8.0))
    t1.commit()
    t2 = table.begin()
    _insert(spark, t2, (3, 7.0), (4, 9.0))
    t2.commit()
    te = table.begin()
    te.delete_keys(spark, spark.createDataFrame([(7.0,)], "val double"), "val")
    # the key straddles BOTH files: both are rewritten
    assert len(te._replaced) == 2
    te.commit()
    assert _rows(spark, table.root) == [(2, 8.0), (4, 9.0)]
    # pre-erasure versions stay readable until vacuum...
    assert _rows(spark, table.root, version=2) == [
        (1, 7.0), (2, 8.0), (3, 7.0), (4, 9.0)
    ]
    # ...and erase -> vacuum physically drops the old files (compliance)
    removed = table.vacuum()
    assert len(removed) == 2
    import pytest as _pytest

    with _pytest.raises(Exception):
        _rows(spark, table.root, version=2)


def test_delete_keys_untouched_files_not_rewritten(spark, table):
    t1 = table.begin()
    _insert(spark, t1, (1, 1.0))
    t1.commit()
    t2 = table.begin()
    _insert(spark, t2, (2, 2.0))
    t2.commit()
    te = table.begin()
    te.delete_keys(spark, spark.createDataFrame([(2,)], "id long"), "id")
    assert len(te._replaced) == 1  # only the file holding the key
    te.commit()
    assert _rows(spark, table.root) == [(1, 1.0)]


def test_delete_keys_bloom_prunes_discovery(spark, tmp_path):
    """On a bloom-indexed key column the erase discovery scans ONLY the
    files whose bloom admits at least one key — the step that keeps the
    GDPR flow from scanning a 100 TB table to find one user."""
    root = str(tmp_path / "bloom_erase")
    df = spark.range(0).selectExpr("id", "cast(id as double) as val")
    table = TransactionalTable.create(root, df.schema, bloom_columns=["id"])
    for lo in (0, 100, 200, 300):
        t = table.begin()
        t.insert(
            spark.createDataFrame(
                [(lo + i, float(lo + i)) for i in range(5)], "id long, val double"
            ).coalesce(1)
        )
        t.commit()
    te = table.begin()
    te.delete_keys(
        spark, spark.createDataFrame([(201,), (203,)], "id long"), "id"
    )
    # blooms admit only the third file; without pruning discovery reads 4
    assert te.discovery_files == 1
    assert len(te._replaced) == 1
    te.commit()
    got = sorted(r.id for r in TransactionalTable(root).read(spark).collect())
    assert got == [i for i in range(5)] + [100 + i for i in range(5)] + [
        200, 202, 204
    ] + [300 + i for i in range(5)]


def test_delete_keys_bloom_all_absent_is_metadata_noop(spark, tmp_path):
    root = str(tmp_path / "bloom_erase_none")
    df = spark.range(0).selectExpr("id")
    table = TransactionalTable.create(root, df.schema, bloom_columns=["id"])
    t = table.begin()
    t.insert(spark.createDataFrame([(1,), (2,)], "id long").coalesce(1))
    t.commit()
    te = table.begin()
    te.delete_keys(spark, spark.createDataFrame([(999,)], "id long"), "id")
    # bloom proves absence: zero files scanned, zero rewritten
    assert te.discovery_files == 0
    assert te._replaced == []
    te.commit()
    got = sorted(r.id for r in TransactionalTable(root).read(spark).collect())
    assert got == [1, 2]


def test_delete_keys_no_match_is_noop(spark, table):
    t1 = table.begin()
    _insert(spark, t1, (1, 1.0))
    t1.commit()
    te = table.begin()
    te.delete_keys(spark, spark.createDataFrame([(999,)], "id long"), "id")
    assert te._replaced == []
    te.commit()
    assert _rows(spark, table.root) == [(1, 1.0)]


def test_replace_where_crash_before_commit_invisible(spark, table):
    t1 = table.begin()
    _insert(spark, t1, (1, 1.0), (10, 10.0))
    t1.commit()
    txn = table.begin()
    txn.replace_where(
        spark,
        ("id", ">=", 10),
        spark.createDataFrame([(10, 100.0)], "id long, val double"),
    )
    # crash without commit: staged rewrite + replacement invisible
    assert _rows(spark, table.root) == [(1, 1.0), (10, 10.0)]


def test_wap_publish_fast_forward_only(spark, table):
    """publish_from adopts a branch atomically, and REFUSES when main
    has advanced past the branch's fork point (adopting the stale view
    would silently discard the interleaved commit)."""
    import pytest as _pytest

    from dbms_query_optimizer_spark.sources.manifest import ConflictError

    t1 = table.begin()
    _insert(spark, t1, (1, 1.0))
    t1.commit()

    branch = table.clone(table.root + "_wap_branch")
    tb = branch.begin()
    _insert(spark, tb, (2, 2.0))
    tb.commit()
    table.publish_from(branch)
    assert _rows(spark, table.root) == [(1, 1.0), (2, 2.0)]

    # second branch forks at v2; main then advances -> publish must refuse
    stale = table.clone(table.root + "_wap_stale")
    ts = stale.begin()
    _insert(spark, ts, (3, 3.0))
    ts.commit()
    tm = table.begin()
    _insert(spark, tm, (9, 9.0))
    tm.commit()
    with _pytest.raises(ConflictError):
        table.publish_from(stale)
    assert _rows(spark, table.root) == [(1, 1.0), (2, 2.0), (9, 9.0)]


def test_wap_publish_refuses_non_branch(spark, table, tmp_path):
    """A table with NO recorded fork point is not a branch of anything:
    publishing it would replace main's entire file list with unrelated
    state. publish_from must refuse rather than silently adopt."""
    import pytest as _pytest

    from dbms_query_optimizer_spark.sources.manifest import (
        ConflictError,
        TransactionalTable,
    )

    t1 = table.begin()
    _insert(spark, t1, (1, 1.0))
    t1.commit()

    schema = spark.range(0).selectExpr("id", "cast(id as double) as val").schema
    stranger = TransactionalTable.create(str(tmp_path / "stranger"), schema)
    ts = stranger.begin()
    _insert(spark, ts, (7, 7.0))
    ts.commit()
    with _pytest.raises(ConflictError, match="fork point"):
        table.publish_from(stranger)
    assert _rows(spark, table.root) == [(1, 1.0)]


def test_wap_publish_refuses_foreign_branch(spark, table, tmp_path):
    """A branch forked from a DIFFERENT table must not publish into this
    one even when the version numbers coincide — version equality is
    meaningless across tables, and adopting the branch would bring
    foreign files while discarding main's state."""
    import pytest as _pytest

    from dbms_query_optimizer_spark.sources.manifest import (
        ConflictError,
        TransactionalTable,
    )

    t1 = table.begin()
    _insert(spark, t1, (1, 1.0))
    t1.commit()

    schema = spark.range(0).selectExpr("id", "cast(id as double) as val").schema
    other = TransactionalTable.create(str(tmp_path / "other"), schema)
    to = other.begin()
    _insert(spark, to, (7, 7.0))
    to.commit()  # other is now at the same version as table (v1)
    foreign = other.clone(str(tmp_path / "other_branch"))
    assert other.snapshot()["version"] == table.snapshot()["version"]
    with _pytest.raises(ConflictError, match="foreign"):
        table.publish_from(foreign)
    assert _rows(spark, table.root) == [(1, 1.0)]

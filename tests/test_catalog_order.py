"""Catalog-order contract: the grading driver oracle-checks the FIRST 50
entries of ``queries()``, so the front of the catalog IS the driver's
correctness-evidence sample. The window ROTATES per round (sentinels
pinned, every other slot spent on queries with no prior driver hash row)
to maximize cumulative independent-oracle coverage; these tests pin that
policy so a registration reshuffle can't silently waste the window on
already-proven queries."""

from dbms_query_optimizer_spark.operators import catalog as C

WINDOW = 50


def test_priority_list_is_exactly_the_window():
    assert len(C.DRIVER_PRIORITY) == WINDOW
    assert list(C.CATALOG)[:WINDOW] == C.DRIVER_PRIORITY


def test_sentinels_pinned():
    assert set(C.DRIVER_SENTINELS) <= set(C.DRIVER_PRIORITY)


def test_window_ungreen_names_come_first():
    """Names with no green driver row (never checked, or red last time)
    must claim slots ahead of freshness re-checks — new/unproven
    evidence always outranks freshness (the r10+ rotation policy)."""
    rest = C.DRIVER_PRIORITY[len(C.DRIVER_SENTINELS):]
    ungreen = [n for n in rest if n not in C.DRIVER_CHECKED_PRIOR_ROUNDS]
    assert rest[: len(ungreen)] == ungreen


def test_everything_oracled():
    """Since round 10 every catalog entry carries a DuckDB value-hash
    oracle — the 4 multimodal decode planes were the last rows-only
    entries, upgraded via SQL re-derivation of the LCG payload
    synthesis. Keep it that way: a new rows-only entry needs a
    documented proof that nothing SQL-recomputable exists."""
    no_oracle = [n for n in C.CATALOG if C.CATALOG[n][1] is None]
    assert no_oracle == [], no_oracle


def test_r12_window_staging_matches_policy():
    """The installed r12 window must BE next_window()'s derivation —
    sentinels, then ungreen re-entries (streaming_index_upsert, red in
    the r11 drive), then hash-stale cohort names (the r12 optimization
    edits), then stalest-last-green freshness re-checks — so the
    staging can't drift from the cohort constants and
    green_hashes.json/green_rounds.json it samples. Editing a cohort
    query (or its oracle) moves its content hash and re-enters it here:
    re-stage the window in the same commit."""
    assert len(C.DRIVER_PRIORITY) == WINDOW
    assert len(set(C.DRIVER_PRIORITY)) == WINDOW
    assert C.DRIVER_PRIORITY == C.DRIVER_SENTINELS + C.R12_PLANNED_WINDOW
    derived = C.next_window()
    assert C.DRIVER_PRIORITY == derived, (
        "staged window drifted from policy; re-stage: "
        f"missing={sorted(set(derived) - set(C.DRIVER_PRIORITY))} "
        f"extra={sorted(set(C.DRIVER_PRIORITY) - set(derived))}"
    )
    # the r11 fold landed: knn_ivfpq (the only r11 never-green) is a
    # cohort member now, and the r10 fold's members stay
    assert "knn_ivfpq" in C.DRIVER_GREENS_R11
    assert set(C.R9_ADDITIONS) <= C.DRIVER_GREENS_R10
    assert {
        "multimodal_audio_features", "multimodal_features",
        "multimodal_image_dhash_dedup", "multimodal_resize",
        "dedup_winnowing", "embedding_random_projection",
        "bpe_train_steps",
    } <= C.DRIVER_GREENS_R10


def test_green_hashes_cover_the_cohorts():
    """Every cohort member must have a recorded content hash (else the
    freshness key degrades to age-only for that name) and every
    recorded hash must match the current code — a mismatch means a
    cohort query changed without being re-staged into the window."""
    recorded = C.green_hashes()
    missing = [
        n
        for cohort in C.DRIVER_GREEN_COHORTS
        for n in cohort
        if n not in recorded
    ]
    assert not missing, f"cohort names without a hash record: {missing}"
    drifted = [
        n
        for cohort in C.DRIVER_GREEN_COHORTS
        for n in cohort
        if recorded[n] != C.query_content_hash(n)
        and n not in C.DRIVER_PRIORITY
    ]
    assert not drifted, (
        "cohort queries edited since their last driver green but not "
        f"re-staged into the window: {drifted}"
    )


def test_cohorts_partition_the_checked_set():
    """Per-round cohorts must be pairwise disjoint (a name's cohort is
    the round of its FIRST green; sentinels live only in rounds 1-3) so
    the r10+ freshness walk visits each name exactly once."""
    seen = set()
    for cohort in C.DRIVER_GREEN_COHORTS:
        dup = seen & cohort
        assert not dup, f"name in two cohorts: {sorted(dup)}"
        seen |= cohort
    assert seen == C.DRIVER_CHECKED_PRIOR_ROUNDS
    assert set(C.DRIVER_SENTINELS) <= C.DRIVER_GREEN_COHORTS[0]
    # r8/r9 cohorts == those windows' non-sentinel oracled greens
    assert len(C.DRIVER_GREENS_R8) == 46
    assert len(C.DRIVER_GREENS_R9) == 42


def test_rechecks_walk_stalest_last_green_first():
    """Freshness re-checks (the slots left after ungreen names) must
    be the names with the OLDEST last-green driver row, ordered by
    (last-green round, first-green cohort age, name) — deterministic
    AND advancing: a name re-proven last round moves to the back of
    the queue instead of being re-sampled (r10 verdict task 3)."""
    recorded = C.green_hashes()
    stale = {
        n
        for cohort in C.DRIVER_GREEN_COHORTS
        for n in cohort
        if recorded.get(n) != C.query_content_hash(n)
    }
    rest = C.DRIVER_PRIORITY[len(C.DRIVER_SENTINELS):]
    rechecks = [
        n for n in rest
        if n in C.DRIVER_CHECKED_PRIOR_ROUNDS and n not in stale
    ]
    last_green = C.green_rounds()
    expected = [
        n
        for _, _, n in sorted(
            (last_green.get(n, 0), ci, n)
            for ci, cohort in enumerate(C.DRIVER_GREEN_COHORTS)
            for n in cohort
            if n not in C.DRIVER_SENTINELS and n not in stale
        )
    ]
    assert rechecks == expected[: len(rechecks)]
    # every cohort name the driver ever proved must carry a round stamp
    missing = [
        n
        for cohort in C.DRIVER_GREEN_COHORTS
        for n in cohort
        if n not in last_green
    ]
    assert not missing, f"cohort names without a last-green round: {missing}"


def test_catalog_intact_after_reorder():
    # reorder must not drop or duplicate entries
    names = list(C.CATALOG)
    assert len(names) == len(set(names))
    assert len(names) >= 161
    # entry()'s flagship query must stay first
    assert names[0] == "flagship_join_agg"


def test_state_width_tracks_shuffle_partitions(spark):
    """state_width must reproduce the measured-optimal 8 at every local
    test width AND actually grow with cluster-scale configs — the
    derivation exists for partitions >> 32, so exercise that regime
    directly (no local drive can)."""
    from dbms_query_optimizer_spark.session import state_width

    df = spark.range(1)
    key = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(key)
    try:
        for parts, want in [("5", 8), ("8", 8), ("32", 8), ("256", 64), ("2000", 500)]:
            spark.conf.set(key, parts)
            assert state_width(df) == want, (parts, want)
        # (the non-numeric fallback inside state_width can't be induced
        # here: Spark validates the conf value at set() time)
    finally:
        spark.conf.set(key, orig)

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


def test_window_spends_slots_on_new_evidence():
    """Every non-sentinel slot must go to a query with no hash-checked
    driver row in any prior round (new, reworked-oracle, or simply never
    sampled) — the rotation policy."""
    fresh = set(C.DRIVER_PRIORITY) - set(C.DRIVER_SENTINELS)
    stale = fresh & C.DRIVER_CHECKED_PRIOR_ROUNDS
    assert not stale, f"window wastes slots on already-proven queries: {sorted(stale)}"


def test_window_mostly_oracled():
    """Rows-only entries give weaker evidence; cap them so the window
    stays dominated by full hash checks."""
    no_oracle = [n for n in C.DRIVER_PRIORITY if C.CATALOG[n][1] is None]
    assert len(no_oracle) <= 4, no_oracle


def test_r9_window_closes_the_backlog_exactly():
    """The installed r9 window must BE the never-checked backlog — no
    overlap with checked names, nothing registered left over — so the
    backlog reaches zero this round (r8 verdict task 1). Includes the
    headroom reconciliation the r8 verdict asked for (task 6): the
    window is exactly 50 wide, so its fullness can't drift in comments."""
    r9 = set(C.R9_PLANNED_WINDOW)
    assert len(C.R9_PLANNED_WINDOW) == len(r9), "duplicates in r9 plan"
    assert len(C.DRIVER_SENTINELS) + len(C.R9_PLANNED_WINDOW) == WINDOW
    assert C.DRIVER_PRIORITY == C.DRIVER_SENTINELS + C.R9_PLANNED_WINDOW
    missing = r9 - set(C.CATALOG)
    assert not missing, f"r9 plan names not registered: {sorted(missing)}"
    adds = set(C.R9_ADDITIONS)
    assert not (adds & r9) and not (adds & C.DRIVER_CHECKED_PRIOR_ROUNDS)
    backlog = set(C.CATALOG) - C.DRIVER_CHECKED_PRIOR_ROUNDS - set(C.DRIVER_SENTINELS)
    assert r9 | adds == backlog, (
        f"uncovered: {sorted(backlog - r9 - adds)}; "
        f"extra: {sorted((r9 | adds) - backlog)}"
    )
    # rows-only-by-design is exactly the 4 multimodal decode planes; all
    # of them sit in the r9 window so each gets a fresh driver row.
    rows_only = {n for n, (_, sql) in C.CATALOG.items() if sql is None}
    assert rows_only == {
        "multimodal_audio_features", "multimodal_features",
        "multimodal_image_dhash_dedup", "multimodal_resize",
    }
    assert rows_only <= r9


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
    # r8 cohort == the r8 window's 46 non-sentinel names (50/50 green)
    assert len(C.DRIVER_GREENS_R8) == 46


def test_r10_window_is_well_formed():
    """The pre-staged r10 freshness window (r8 verdict task 4):
    sentinels first, then every name with no GREEN cohort row (so an
    r9-window name left red re-enters automatically — cohort
    membership, not window membership, is the eligibility test), then
    oldest-cohort (rounds 1-3) re-checks — deterministic and exactly
    window-sized."""
    w = C.r10_window()
    assert len(w) == WINDOW
    assert len(set(w)) == WINDOW
    assert w[: len(C.DRIVER_SENTINELS)] == C.DRIVER_SENTINELS
    rest = w[len(C.DRIVER_SENTINELS):]
    new_ops = [n for n in rest if n not in C.DRIVER_CHECKED_PRIOR_ROUNDS]
    rechecks = [n for n in rest if n in C.DRIVER_CHECKED_PRIOR_ROUNDS]
    # ungreen names (the whole r9 window until its greens are folded
    # into a DRIVER_GREENS_R9 cohort, plus any round-9 additions) must
    # all come before any freshness re-check
    assert rest[: len(new_ops)] == new_ops
    assert set(C.R9_ADDITIONS) <= set(new_ops)
    # re-checks come from the oldest cohort, alphabetically
    oldest = sorted(C.DRIVER_GREEN_COHORTS[0] - set(C.DRIVER_SENTINELS))
    assert rechecks == oldest[: len(rechecks)]

    # simulate the r10 rotation's fold: with the whole r9 window green,
    # the window spends its non-sentinel slots on the round-9 additions
    # first, then rounds-1-3 re-checks — and a red name would re-enter
    folded = C.DRIVER_CHECKED_PRIOR_ROUNDS | set(C.R9_PLANNED_WINDOW)
    never = [n for n in C.CATALOG
             if n not in folded and n not in set(C.DRIVER_SENTINELS)]
    assert set(never) == set(C.R9_ADDITIONS)


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

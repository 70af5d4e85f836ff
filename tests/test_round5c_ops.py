"""Semantics tests for the round-5 third-session operators, independent of
the DuckDB oracles (tests/test_queries_oracle.py runs those): each test
pins an invariant or re-derives the answer with a pure-Python reference,
so a bug mirrored into the oracle SQL would still be caught here.
"""

from __future__ import annotations

from fractions import Fraction

import duckdb
from pyspark.sql import functions as F

from dbms_query_optimizer_spark.operators import catalog

QS = catalog.queries()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in ("events", "lineitem", "documents", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _avg_ranks_doubled(values: list[int]) -> dict[int, int]:
    """value -> 2 x average rank (exact integer), average-rank ties."""
    out: dict[int, int] = {}
    below = 0
    last = None
    cnt = 0
    for v in sorted(values):
        if v != last and last is not None:
            out[last] = 2 * below + cnt + 1
            below += cnt
            cnt = 0
        last = v
        cnt += 1
    if last is not None:
        out[last] = 2 * below + cnt + 1
    return out


# ------------------------------------------------------------- ROC-AUC


def test_auc_matches_naive_pairwise(spark, sf_dir):
    """AUC from the rank-sum identity must equal the naive definition:
    P(pos > neg) + 0.5 * P(pos == neg), counted over per-score groups
    (equivalent to all pos x neg pairs, but feasible)."""
    row = QS["model_auc_roc"](spark, sf_dir).collect()[0]
    con = _duck(sf_dir)
    # reproduce the scored frame via the catalog's own oracle CTE would
    # re-trust the SQL; instead rebuild from the Spark result's inputs:
    # the naive pairwise count only needs the (score, label) histogram,
    # which we take from Spark itself but combine with INDEPENDENT math.
    hist = (
        QS["quality_classifier_score"](spark, sf_dir)
        .selectExpr(
            "CAST(ROUND(quality_p * 1000000.0) AS BIGINT) AS p_micro",
            "CAST(lang = 'en' AS BIGINT) AS y",
        )
        .groupBy("p_micro")
        .agg(F.sum("y").alias("np"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per = sorted((r["p_micro"], int(r["np"]), int(r["n"]) - int(r["np"])) for r in hist)
    num2 = 0  # 2 * (wins + 0.5 * ties), exact integer
    neg_below = 0
    for _, np_, nn in per:
        num2 += np_ * (2 * neg_below + nn)
        neg_below += nn
    n_pos = sum(p for _, p, _ in per)
    n_neg = sum(n for _, _, n in per)
    assert (row.n_pos, row.n_neg, row.auc_num2) == (n_pos, n_neg, num2)
    assert row.auc == num2 / (2.0 * n_pos * n_neg)
    assert 0.0 <= row.auc <= 1.0
    assert row.gini == 2.0 * row.auc - 1.0
    con.close()


def test_pr_auc_matches_python_reference(spark, sf_dir):
    """AP re-derived by walking the (score, label) histogram in
    descending order with the identical nano-quantization."""
    row = QS["model_pr_auc"](spark, sf_dir).collect()[0]
    hist = (
        QS["quality_classifier_score"](spark, sf_dir)
        .selectExpr(
            "CAST(ROUND(quality_p * 1000000.0) AS BIGINT) AS p_micro",
            "CAST(lang = 'en' AS BIGINT) AS y",
        )
        .groupBy("p_micro")
        .agg(F.sum("y").alias("np"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    groups = sorted(
        ((r["p_micro"], int(r["np"]), int(r["n"]) - int(r["np"])) for r in hist),
        reverse=True,
    )
    p_total = sum(np_ for _, np_, _ in groups)
    cum_pos = cum_neg = 0
    ap_nano = 0
    for _, np_, nn in groups:
        cum_pos += np_
        cum_neg += nn
        term = np_ * cum_pos / (p_total * (cum_pos + cum_neg))
        ap_nano += int(round(term * 1e9))
    assert (row.p_total, row.n_thresholds, row.ap_nano) == (
        p_total,
        len(groups),
        ap_nano,
    )
    assert 0.0 < row.ap <= 1.0
    assert row.ap == ap_nano / 1e9


def test_confusion_report_matches_score_query(spark, sf_dir):
    """tp/fp/fn/tn re-derived from the already-oracled per-doc score
    query; derived metrics re-checked from the exact counts."""
    rows = QS["quality_classifier_score"](spark, sf_dir).collect()
    tp = sum(1 for r in rows if r.keep and r.lang == "en")
    fp = sum(1 for r in rows if r.keep and r.lang != "en")
    fn = sum(1 for r in rows if not r.keep and r.lang == "en")
    tn = sum(1 for r in rows if not r.keep and r.lang != "en")
    got = QS["model_confusion_report"](spark, sf_dir).collect()[0]
    assert (got.tp, got.fp, got.fn, got.tn) == (tp, fp, fn, tn)
    assert got.accuracy == (tp + tn) / (tp + fp + fn + tn)
    assert got.precision == tp / (tp + fp)
    assert got.recall == tp / (tp + fn)
    assert got.f1 == 2 * tp / (2 * tp + fp + fn)


def test_bootstrap_ci_matches_python_reference(spark, sf_dir):
    """Poisson weights re-drawn in pure Python from the same md5 stream;
    replicate means and the selected CI order statistics must match."""
    import hashlib

    from dbms_query_optimizer_spark.operators.sampling import (
        BOOT_B,
        BOOT_CI_HI_RANK,
        BOOT_CI_LO_RANK,
        BOOT_THRESH,
    )

    con = _duck(sf_dir)
    docs = con.execute("SELECT doc_id, n_chars FROM documents").fetchall()
    means = []
    for b in range(BOOT_B):
        wx = ws = 0
        for doc_id, x in docs:
            h = int(
                hashlib.md5(f"{doc_id}:{b}".encode()).hexdigest()[:8], 16
            )
            w = sum(1 for t in BOOT_THRESH if h >= t)
            wx += w * x
            ws += w
        means.append(wx / ws)
    means.sort()
    got = QS["bootstrap_ci_mean"](spark, sf_dir).collect()[0]
    assert got.n_replicates == BOOT_B
    assert got.ci_lo == means[BOOT_CI_LO_RANK - 1]
    assert got.ci_hi == means[BOOT_CI_HI_RANK - 1]
    n = len(docs)
    assert got.n_docs == n
    assert got.point_mean == sum(x for _, x in docs) / n
    assert got.ci_lo <= got.point_mean <= got.ci_hi
    con.close()


def test_group_kfold_no_group_straddles_folds(spark, sf_dir):
    """Structural leakage check: fold is a function of source, so the
    distinct-source counts across folds must sum to the corpus's
    distinct sources; shares sum to 1."""
    rows = QS["group_kfold_split"](spark, sf_dir).collect()
    con = _duck(sf_dir)
    n_sources, n_docs = con.execute(
        "SELECT COUNT(DISTINCT source), COUNT(*) FROM documents"
    ).fetchone()
    assert sum(r.n_sources for r in rows) == n_sources
    assert sum(r.n_docs for r in rows) == n_docs
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-12
    con.close()


# ----------------------------------------------------------------- DSIR


def test_dsir_weights_match_python_reference(spark, sf_dir):
    """Hashed-unigram importance weights re-derived in pure Python with
    the same Horner hash; directional check that the English target
    scores English docs higher per token."""
    import math
    import re

    con = _duck(sf_dir)
    docs = con.execute("SELECT doc_id, lang, text FROM documents").fetchall()
    B, BASE, PRIME = 64, 257, 2_147_483_647

    def buckets(text):
        out = []
        for w in re.split("[^a-z]+", text.lower()):
            if not w:
                continue
            h = 0
            for ch in w:
                h = (h * BASE + ord(ch)) % PRIME
            out.append(h % B)
        return out

    ct = [0] * B
    cr = [0] * B
    per_doc: dict[int, dict[int, int]] = {}
    langs: dict[int, str] = {}
    for doc_id, lang, text in docs:
        langs[doc_id] = lang
        d = per_doc.setdefault(doc_id, {})
        for b in buckets(text):
            cr[b] += 1
            if lang == "en":
                ct[b] += 1
            d[b] = d.get(b, 0) + 1
    t_tot, r_tot = sum(ct), sum(cr)
    lr_nano = [
        int(round((math.log((ct[b] + 1) / (t_tot + B))
                   - math.log((cr[b] + 1) / (r_tot + B))) * 1e9))
        for b in range(B)
    ]
    got = {r.doc_id: r for r in QS["dsir_importance_weights"](spark, sf_dir).collect()}
    assert set(got) == {d for d in per_doc if per_doc[d]}
    for doc_id, counts in per_doc.items():
        if not counts:
            continue
        w = sum(c * lr_nano[b] for b, c in counts.items())
        n = sum(counts.values())
        r = got[doc_id]
        assert (r.n_tokens, r.weight_nano) == (n, w), doc_id
        q = abs(w) // n
        assert r.per_token_nano == (q if w >= 0 else -q)
    en = [r.per_token_nano for r in got.values() if langs[r.doc_id] == "en"]
    other = [r.per_token_nano for r in got.values() if langs[r.doc_id] != "en"]
    assert sum(en) / len(en) > sum(other) / len(other)
    con.close()


def test_ab_test_cuped_reference_and_invariant(spark, sf_dir):
    """Per-user pre/experiment sums and θ re-derived in Python; plus the
    CUPED conservation law: user-weighted adjusted means equal the raw
    pooled mean (the adjustment must not move the overall metric)."""
    import hashlib

    con = _duck(sf_dir)
    mid = con.execute(
        """
        SELECT date_add(MIN(CAST(ts AS DATE)),
               CAST(date_diff('day', MIN(CAST(ts AS DATE)),
                              MAX(CAST(ts AS DATE))) // 2 AS INT))
        FROM events
        """
    ).fetchone()[0]
    rows = con.execute(
        """
        SELECT user_id, CAST(ts AS DATE), CAST(ROUND(value * 100) AS BIGINT)
        FROM events WHERE event_type = 'purchase'
        """
    ).fetchall()
    per_user: dict[int, list[int]] = {}
    for uid, day, cents in rows:
        xy = per_user.setdefault(uid, [0, 0])
        xy[0 if day <= mid else 1] += cents
    n = len(per_user)
    sx = sum(v[0] for v in per_user.values())
    sy = sum(v[1] for v in per_user.values())
    sxy = sum(v[0] * v[1] for v in per_user.values())
    sxx = sum(v[0] * v[0] for v in per_user.values())
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    arms: dict[int, list[int]] = {0: [0, 0, 0], 1: [0, 0, 0]}
    for uid, (x, y) in per_user.items():
        a = int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % 2
        arms[a][0] += 1
        arms[a][1] += x
        arms[a][2] += y
    got = {r.arm: r for r in QS["ab_test_cuped"](spark, sf_dir).collect()}
    for a in (0, 1):
        na, sxa, sya = arms[a]
        r = got[a]
        assert (r.n_users, r.sx_arm, r.sy_arm) == (na, sxa, sya)
        assert abs(r.theta - theta) < 1e-9
        assert abs(
            r.cuped_mean_y
            - (sya / na - r.theta * (sxa / na - sx / n))
        ) < 1e-9
    pooled_cuped = sum(got[a].n_users * got[a].cuped_mean_y for a in (0, 1))
    assert abs(pooled_cuped - sy) < 1e-6 * max(1, abs(sy))
    con.close()


# ------------------------------------------------------------ Spearman


def test_spearman_matches_python_reference(spark, sf_dir):
    """Exact-integer rank sums and rho vs a Fraction-exact Python
    implementation of Pearson-on-average-ranks."""
    con = _duck(sf_dir)
    pairs = con.execute(
        """
        SELECT CAST(ROUND(l_quantity * 100) AS BIGINT),
               CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        FROM lineitem
        """
    ).fetchall()
    xs = [a for a, _ in pairs]
    ys = [b for _, b in pairs]
    rx = _avg_ranks_doubled(xs)
    ry = _avg_ranks_doubled(ys)
    n = len(pairs)
    s_xy = s_xx = s_yy = 0
    for a, b in pairs:
        dx = rx[a] - (n + 1)
        dy = ry[b] - (n + 1)
        s_xy += dx * dy
        s_xx += dx * dx
        s_yy += dy * dy
    row = QS["spearman_rank_corr"](spark, sf_dir).collect()[0]
    assert (row.n, row.s_xy, row.s_xx, row.s_yy) == (n, s_xy, s_xx, s_yy)
    rho_exact = Fraction(s_xy * s_xy, s_xx * s_yy)
    assert abs(row.rho * abs(row.rho) - float(rho_exact) * (1 if s_xy >= 0 else -1)) < 1e-12
    # rank sums are tie-invariant: sum of doubled average ranks == n(n+1)
    assert sum(rx[a] for a in xs) == n * (n + 1)
    assert sum(ry[b] for b in ys) == n * (n + 1)
    con.close()


# ---------------------------------------------------------------- OHLC


def test_ohlc_invariants_and_reference(spark, sf_dir):
    """low <= open, close <= high per bar; open/close re-derived from a
    Python scan of the raw events."""
    con = _duck(sf_dir)
    raw = con.execute(
        """
        SELECT event_type, CAST(ts AS DATE), ts, event_id,
               CAST(ROUND(value * 100) AS BIGINT)
        FROM events
        """
    ).fetchall()
    bars: dict[tuple, list] = {}
    for et, day, ts, eid, cents in raw:
        bars.setdefault((et, day), []).append((ts, eid, cents))
    expect = {}
    for k, rows in bars.items():
        rows.sort()
        cs = [c for _, _, c in rows]
        expect[k] = (rows[0][2], max(cs), min(cs), rows[-1][2], len(rows), sum(cs))
    got = {
        (r.event_type, r.day): (
            r.open_cents,
            r.high_cents,
            r.low_cents,
            r.close_cents,
            r.n_events,
            r.turnover_cents,
        )
        for r in QS["events_ohlc_bars"](spark, sf_dir).collect()
    }
    assert got == expect
    for o, h, lo, c, n, _ in got.values():
        assert lo <= o <= h and lo <= c <= h and n >= 1
    con.close()


# ---------------------------------------------- interpolated percentile


def test_percentile_cont_matches_numpy(spark, sf_dir):
    """Domain-collapse order-statistic selection == numpy's 'linear'
    (PERCENTILE_CONT) interpolation, exactly in the integer numerator."""
    con = _duck(sf_dir)
    rows = con.execute(
        """
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events ORDER BY event_type, cents
        """
    ).fetchall()
    series: dict[str, list[int]] = {}
    for et, c in rows:
        series.setdefault(et, []).append(c)
    got = {
        (r.event_type, r.p): (r.n, r.numer_centpct, r.pctl_cents)
        for r in QS["percentile_cont_domain"](spark, sf_dir).collect()
    }
    for et, vals in series.items():
        n = len(vals)
        for p in (50, 90, 99):
            pos100 = p * (n - 1)
            k, r = divmod(pos100, 100)
            v_lo = vals[k]
            v_hi = vals[k + 1] if k + 1 < n else v_lo
            numer = v_lo * (100 - r) + v_hi * r
            assert got[(et, p)] == (n, numer, numer / 100.0), (et, p)


# -------------------------------------------------------- standardize


def test_feature_standardize_reference(spark, sf_dir):
    """Fit-on-train sums re-derived in Python from the same md5 split;
    flags recomputed with the identical float expression tree."""
    import hashlib
    import math

    con = _duck(sf_dir)
    docs = con.execute(
        "SELECT doc_id, n_chars, len(string_split_regex(trim(text), '\\s+')) FROM documents"
    ).fetchall()
    feats: dict[str, dict[str, list[int]]] = {
        "n_chars": {"tr": [], "ev": []},
        "n_tokens": {"tr": [], "ev": []},
    }
    for doc_id, n_chars, n_tok in docs:
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 10
        side = "tr" if b < 8 else "ev"
        feats["n_chars"][side].append(int(n_chars))
        feats["n_tokens"][side].append(int(n_tok))
    got = {
        r.feature: r for r in QS["feature_standardize"](spark, sf_dir).collect()
    }
    for feat, d in feats.items():
        tr, ev = d["tr"], d["ev"]
        n_tr, s, ss = len(tr), sum(tr), sum(v * v for v in tr)
        r = got[feat]
        assert (r.n_tr, r.s_tr, r.ss_tr, r.n_eval) == (n_tr, s, ss, len(ev))
        mean = s / n_tr
        std = math.sqrt((n_tr * ss - s * s) / (n_tr * (n_tr - 1)))
        assert r.mean_tr == mean and r.std_tr == std
        flagged = sum(1 for x in ev if abs((x - mean) / std) > 3.0)
        assert r.n_flagged == flagged
    con.close()


def test_pipeline_funnel_monotone_and_anchored(spark, sf_dir):
    """Funnel counts must be non-increasing stage to stage, anchored at
    the raw corpus size; token mass shrinks with the docs."""
    rows = {r.stage: r for r in QS["pipeline_funnel_report"](spark, sf_dir).collect()}
    con = _duck(sf_dir)
    n_raw = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    order = [
        "0_raw", "1_lang", "2_quality", "3_exact_dedup",
        "4_token_sort_dedup", "5_decontaminated",
    ]
    assert set(rows) == set(order)
    assert rows["0_raw"].n_docs == n_raw and rows["0_raw"].pct_docs == 1.0
    for a, b in zip(order, order[1:]):
        assert rows[b].n_docs <= rows[a].n_docs, (a, b)
        assert rows[b].n_tokens <= rows[a].n_tokens, (a, b)
    for r in rows.values():
        assert 0.0 < r.pct_docs <= 1.0
        assert r.pct_docs == r.n_docs / n_raw
    # the eval split alone guarantees stage 5 dropped something
    assert rows["5_decontaminated"].n_docs < rows["4_token_sort_dedup"].n_docs
    con.close()


def test_gbt_margins_are_valid_leaf_sums(spark, sf_dir):
    """Every ensemble margin must be one of the 27 possible leaf-sum
    combinations, keep == (margin >= 0), and the trees actually split
    the corpus (more than one distinct margin)."""
    leaves1 = {-800000, -200000, 500000}
    leaves2 = {-400000, -300000, 300000}
    leaves3 = {400000, 100000, -100000}
    valid = {a + b + c for a in leaves1 for b in leaves2 for c in leaves3}
    rows = QS["gbt_inference_sql"](spark, sf_dir).collect()
    assert rows
    margins = {r.margin_micro for r in rows}
    assert margins <= valid
    assert len(margins) > 1
    for r in rows:
        assert r.keep == (r.margin_micro >= 0)


def test_recsys_cosine_bounds_and_support(spark, sf_dir):
    """Structural laws: co ≤ min(n_a, n_b) (intersection bound), cosine
    in (0, 1], descending by the rounded score, and co ≥ threshold."""
    from dbms_query_optimizer_spark.operators.relational import RECSYS_MIN_CO

    rows = QS["recsys_item_cosine"](spark, sf_dir).collect()
    assert rows
    prev = None
    for r in sorted(rows, key=lambda r: r.rnk):
        assert r.co <= min(r.n_a, r.n_b)
        assert r.co >= RECSYS_MIN_CO
        assert 0.0 < r.cosine <= 1.0
        assert abs(r.cosine - r.co / (r.n_a * r.n_b) ** 0.5) < 1e-12
        key = round(r.cosine, 9)
        if prev is not None:
            assert key <= prev + 1e-12
        prev = key


def test_cluster_key_advisor_reference(spark, sf_dir):
    """Span ratios re-derived in pure Python (NTILE by sorted position,
    per-bucket max-min spans); diagonal must be the near-perfect 1/B."""
    con = _duck(sf_dir)
    rows = con.execute(
        """
        SELECT o_orderkey, o_custkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT),
               CAST(date_diff('day', DATE '1990-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT)
        FROM orders
        """
    ).fetchall()
    names = ["o_orderkey", "o_custkey", "o_totalprice_c", "o_orderdate_d"]
    B = 8
    n = len(rows)
    got = {
        (r.cluster_col, r.query_col): r
        for r in QS["cluster_key_advisor"](spark, sf_dir).collect()
    }
    gspan = {
        q: max(r[i] for r in rows) - min(r[i] for r in rows)
        for i, q in enumerate(names)
    }
    q_, rem = divmod(n, B)
    sizes = [q_ + 1] * rem + [q_] * (B - rem)
    for ci, ckey in enumerate(names):
        ordered = sorted(rows, key=lambda r: (r[ci], r[0]))
        pos = 0
        spans = {q: 0 for q in names}
        for size in sizes:
            chunk = ordered[pos : pos + size]
            pos += size
            for qi, q in enumerate(names):
                vals = [r[qi] for r in chunk]
                spans[q] += max(vals) - min(vals)
        for q in names:
            r = got[(ckey, q)]
            assert (r.sum_bucket_span, r.global_span) == (spans[q], gspan[q]), (
                ckey,
                q,
            )
            assert r.span_ratio == spans[q] / (8.0 * gspan[q])
    for q in names:
        assert got[(q, q)].span_ratio <= 1.0 / B + 0.01  # diagonal ~ 1/B
    con.close()


def test_source_loo_vocab_reference(spark, sf_dir):
    """Per-source unique-token counts re-derived in pure Python; the LOO
    identity loo_vocab = |V| − unique(s) and Σ unique ≤ |V| law."""
    con = _duck(sf_dir)
    docs = con.execute("SELECT source, text FROM documents").fetchall()
    tok_srcs: dict[str, set] = {}
    for src, text in docs:
        for t in text.split(" "):
            if t:
                tok_srcs.setdefault(t, set()).add(src)
    v_total = len(tok_srcs)
    uniq: dict[str, int] = {}
    for t, ss in tok_srcs.items():
        if len(ss) == 1:
            s = next(iter(ss))
            uniq[s] = uniq.get(s, 0) + 1
    got = {r.source: r for r in QS["source_loo_vocab"](spark, sf_dir).collect()}
    assert set(got) == {s for s, _ in docs}
    for s, r in got.items():
        assert r.n_unique_tokens == uniq.get(s, 0)
        assert r.v_total == v_total
        assert r.loo_vocab == v_total - uniq.get(s, 0)
        assert r.contribution == uniq.get(s, 0) / v_total
    assert sum(r.n_unique_tokens for r in got.values()) <= v_total
    con.close()


def test_markov_attribution_reference_and_laws(spark, sf_dir):
    """Absorption probabilities re-derived with Fraction-exact K-step
    iteration from independently-built transition counts; plus the
    structural laws: removal never raises conversion, shares sum to 1."""
    from fractions import Fraction

    from dbms_query_optimizer_spark.operators.graph import (
        MARKOV_CHANNELS,
        MARKOV_CONV,
        MARKOV_K,
        MARKOV_START,
    )

    con = _duck(sf_dir)
    pairs = con.execute(
        """
        WITH ordered AS (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ), flagged AS (
            SELECT *, MIN(CASE WHEN event_type = 'purchase' THEN rn END)
                      OVER (PARTITION BY user_id) AS fp
            FROM ordered
        ), kept AS (
            SELECT user_id, event_type, rn, fp,
                   LEAD(event_type) OVER (PARTITION BY user_id
                                          ORDER BY rn) AS nxt
            FROM flagged WHERE rn <= COALESCE(fp, 2147483647)
        )
        SELECT event_type AS s, nxt AS t FROM kept WHERE nxt IS NOT NULL
        UNION ALL SELECT '__start__', event_type FROM kept WHERE rn = 1
        UNION ALL SELECT event_type, '__null__' FROM kept
                  WHERE nxt IS NULL AND fp IS NULL
        """
    ).fetchall()
    counts: dict[tuple, int] = {}
    out_tot: dict[str, int] = {}
    for s, t in pairs:
        counts[(s, t)] = counts.get((s, t), 0) + 1
        out_tot[s] = out_tot.get(s, 0) + 1
    transient = sorted(out_tot)
    probs = {k: Fraction(n, out_tot[k[0]]) for k, n in counts.items()}

    def absorb(removed):
        x = {s: Fraction(0) for s in transient}
        for _ in range(MARKOV_K):
            x = {
                s: probs.get((s, MARKOV_CONV), Fraction(0))
                + sum(
                    probs.get((s, t), Fraction(0)) * x[t]
                    for t in transient
                    if t != removed
                )
                for s in transient
            }
        return x[MARKOV_START]

    p_base = absorb(None)
    got = {r.channel: r for r in QS["markov_attribution"](spark, sf_dir).collect()}
    assert set(got) == set(MARKOV_CHANNELS)
    effects = {}
    for c in MARKOV_CHANNELS:
        r = got[c]
        p_rm = absorb(c)
        assert abs(r.p_base - float(p_base)) < 1e-6
        assert abs(r.p_removed - float(p_rm)) < 1e-6
        assert r.removal_effect >= 0  # removal can only hurt conversion
        assert r.n_touch == out_tot.get(c, 0)
        effects[c] = float(p_base - p_rm)
    shares = sum(got[c].credit_share for c in MARKOV_CHANNELS)
    assert abs(shares - 1.0) < 1e-5
    con.close()


# ------------------------------------------- streaming left-outer join


def test_stream_left_join_contains_inner_and_bounds_nulls(spark, sf_dir):
    """Left ⊇ inner; NULL rows are exactly the watermark-expired
    unmatched clicks (re-derived via DuckDB)."""
    left = QS["streaming_stream_stream_left_join"](spark, sf_dir).collect()
    inner_keys = {
        (r.click_id, r.purchase_id)
        for r in QS["streaming_stream_stream_join"](spark, sf_dir).collect()
    }
    matched = {(r.click_id, r.purchase_id) for r in left if r.purchase_id is not None}
    assert matched == inner_keys
    con = _duck(sf_dir)
    n_null_expected = con.execute(
        """
        WITH wm AS (
            SELECT least(
                (SELECT max(ts) FROM events WHERE event_type = 'click'),
                (SELECT max(ts) FROM events WHERE event_type = 'purchase')
            ) - INTERVAL 1 HOUR AS w
        )
        SELECT COUNT(*) FROM events c, wm
        WHERE c.event_type = 'click'
          AND NOT EXISTS (
              SELECT 1 FROM events p
              WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
                AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE)
          AND c.ts + INTERVAL 30 MINUTE < wm.w
        """
    ).fetchone()[0]
    n_null = sum(1 for r in left if r.purchase_id is None)
    assert n_null == n_null_expected
    for r in left:
        if r.purchase_id is None:
            assert r.purchase_ts is None
        else:
            assert r.click_ts <= r.purchase_ts
    con.close()

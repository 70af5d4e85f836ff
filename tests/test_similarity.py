"""Similarity-search behavior tests beyond oracle parity: the approximate
LSH path is judged by recall against the exact baseline (the right metric
for an ANN operator — equality is checked separately per-variant by the
DuckDB oracle)."""

from __future__ import annotations

from dbms_query_optimizer_spark.operators.similarity import (
    IVF_K,
    IVF_NPROBE,
    TOP_K,
    q_knn_brute_force,
    q_knn_ivf,
    q_knn_lsh_bucketed,
)


def _topk_sets(df):
    rows = df.collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    exact = _topk_sets(q_knn_brute_force(spark, sf_dir))
    approx = _topk_sets(q_knn_lsh_bucketed(spark, sf_dir))

    assert set(exact) == set(approx)  # same query set
    recalls = []
    for qid, truth in exact.items():
        got = approx.get(qid, set())
        assert len(got) <= TOP_K
        recalls.append(len(got & truth) / len(truth))
    mean_recall = sum(recalls) / len(recalls)
    # multi-probe sign-LSH examines ~5/16 of the corpus; it must beat the
    # random baseline at that budget (~0.31 expected by chance would only
    # hold if cosine were independent of the sign bits — it is not)
    assert mean_recall > 0.3, f"mean recall {mean_recall:.2f}, per-query {recalls}"


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    exact = _topk_sets(q_knn_brute_force(spark, sf_dir))
    approx = _topk_sets(q_knn_ivf(spark, sf_dir))

    assert set(exact) == set(approx)
    recalls = [
        len(approx[qid] & truth) / len(truth) for qid, truth in exact.items()
    ]
    mean_recall = sum(recalls) / len(recalls)
    # searching nprobe/k of the corpus must beat that random-sample baseline
    assert mean_recall > IVF_NPROBE / IVF_K, (
        f"mean recall {mean_recall:.2f}, per-query {recalls}"
    )


def test_brute_force_shape(spark, sf_dir):
    df = q_knn_brute_force(spark, sf_dir)
    rows = df.collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in per_q.items():
        assert len(rs) == TOP_K
        ranks = [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert ranks == list(range(1, TOP_K + 1))
        cosines = [r["cosine"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["neighbor_id"] != qid for r in rs)


def test_embedding_dedup_lsh_subset_and_recall(spark, sf_dir):
    from dbms_query_optimizer_spark.operators.dedup import (
        q_dedup_embedding_cosine,
        q_dedup_embedding_cosine_lsh,
    )

    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in q_dedup_embedding_cosine(spark, sf_dir).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in q_dedup_embedding_cosine_lsh(spark, sf_dir).collect()
    }
    # every LSH pair is a true pair with the identical verified cosine
    assert set(lsh) <= set(exact)
    assert all(exact[p] == c for p, c in lsh.items())
    # banded sign-LSH recall on this corpus (pairs hover just above the
    # 0.4 threshold — the hard regime for LSH); deterministic, so a fixed
    # floor is safe: measured 35/59 at sf0.01
    if exact:
        assert len(lsh) / len(exact) >= 0.4, (len(lsh), len(exact))


def test_pq_adc_recall_vs_exact_l2(spark, sf_dir):
    """PQ-ADC shortlists by approximate squared L2 then exact-reranks;
    recall is judged against the exact L2 top-k (numpy oracle over the
    raw parquet), plus structural invariants: full rank lists, self
    excluded, final order ascending in the EXACT distance (the rerank
    contract; adc_d2 is the stage-1 score and need not be monotone in
    the final rank)."""
    import numpy as np
    import pyarrow.parquet as pq

    from dbms_query_optimizer_spark.operators.similarity import (
        N_QUERIES,
        q_embedding_pq_adc,
    )

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    ids = np.array(tbl["vec_id"])
    X = np.array([list(v) for v in tbl["embedding"]], dtype=np.float64)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]

    exact: dict[int, set[int]] = {}
    for qi in range(N_QUERIES):
        d2 = ((X - X[qi]) ** 2).sum(axis=1)
        d2[qi] = np.inf
        top = np.argsort(d2, kind="stable")[:TOP_K]
        exact[int(ids[qi])] = {int(ids[i]) for i in top}

    per_q: dict[int, list] = {}
    for r in q_embedding_pq_adc(spark, sf_dir).collect():
        per_q.setdefault(r["query_id"], []).append(r)

    assert set(per_q) == set(exact)
    recalls = []
    for qid, rs in per_q.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, TOP_K + 1))
        l2s = [r["l2"] for r in rs]
        assert l2s == sorted(l2s) and l2s[0] >= 0
        assert all(r["adc_d2"] >= 0 for r in rs)
        assert all(r["neighbor_id"] != qid for r in rs)
        recalls.append(len({r["neighbor_id"] for r in rs} & exact[qid]) / TOP_K)
    mean_recall = sum(recalls) / len(recalls)
    # With the density-aware build (codebook k and rerank shortlist both
    # grow with sqrt(corpus)): measured 0.82/0.84/0.86 at
    # sf0.001/0.01/0.1 (vs 0.60 at sf0.1 under the old fixed 4x
    # shortlist, 0.44->0.29 raw-ADC before the rerank, and 0.02 by
    # chance). Floor sits below the measurements because centroid means
    # are float sums whose partial-aggregation order varies with
    # partitioning — a borderline assignment may flip between cluster
    # layouts. Keep in lockstep with similarity.PQ_RECALL_FLOOR.
    assert mean_recall >= 0.6, f"mean recall {mean_recall:.2f}, per-query {recalls}"


def test_ivfpq_recall_vs_exact_l2(spark, sf_dir):
    """The composed IVF+PQ probe (residual PQ codes inside DPP-pruned
    IVF cells + exact rerank) judged against the exact L2 top-k (numpy
    oracle), plus the same structural invariants as the flat-PQ test:
    full rank lists, self excluded, final order ascending in the exact
    distance. The recall ceiling is the IVF cell coverage (only nprobe
    of k cells are read), so the floor is the chance baseline at that
    read budget — measured ~0.68 at sf0.01 vs 0.375 by chance."""
    import numpy as np
    import pyarrow.parquet as pq

    from dbms_query_optimizer_spark.operators.similarity import (
        IVFPQ_RECALL_FLOOR,
        N_QUERIES,
        q_knn_ivfpq,
    )

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    ids = np.array(tbl["vec_id"])
    X = np.array([list(v) for v in tbl["embedding"]], dtype=np.float64)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]

    exact: dict[int, set[int]] = {}
    for qi in range(N_QUERIES):
        d2 = ((X - X[qi]) ** 2).sum(axis=1)
        d2[qi] = np.inf
        top = np.argsort(d2, kind="stable")[:TOP_K]
        exact[int(ids[qi])] = {int(ids[i]) for i in top}

    per_q: dict[int, list] = {}
    for r in q_knn_ivfpq(spark, sf_dir).collect():
        per_q.setdefault(r["query_id"], []).append(r)

    assert set(per_q) == set(exact)
    recalls = []
    for qid, rs in per_q.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, TOP_K + 1))
        l2s = [r["l2"] for r in rs]
        assert l2s == sorted(l2s) and l2s[0] >= 0
        assert all(r["adc_d2"] >= 0 for r in rs)
        assert all(r["neighbor_id"] != qid for r in rs)
        recalls.append(len({r["neighbor_id"] for r in rs} & exact[qid]) / TOP_K)
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= IVFPQ_RECALL_FLOOR, (
        f"mean recall {mean_recall:.2f}, per-query {recalls}"
    )


def test_ivfpq_index_layout_and_idempotence(spark, sf_dir):
    """The persisted composed index must be cell-partitioned (the DPP
    prune surface), cover every corpus vector with exactly PQ_M codes,
    and rebuild lazily: a second build call with a valid marker must
    not retrain (same artifact mtimes)."""
    import os

    from dbms_query_optimizer_spark.operators import similarity as S

    root = S.build_ivfpq_index(spark, sf_dir)
    codes_dir = os.path.join(root, "codes")
    parts = [d for d in os.listdir(codes_dir) if d.startswith("cell=")]
    assert len(parts) > 1, "code table not partitioned by cell"

    codes = spark.read.parquet(codes_dir)
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    per_vec = codes.groupBy("vec_id").count().collect()
    assert len(per_vec) == n_vecs
    assert all(r["count"] == S.PQ_M for r in per_vec)

    def _mtimes():
        out = {}
        for base, _, files in os.walk(codes_dir):
            for f in files:
                p = os.path.join(base, f)
                out[p] = os.path.getmtime(p)
        return out

    before = _mtimes()
    assert S.build_ivfpq_index(spark, sf_dir) == root
    assert _mtimes() == before, "idempotent rebuild retrained the index"


def test_dedup_semantic_properties(spark, sf_dir):
    """SemDeDup survivorship: every drop is a true near-dup of its smaller-id
    in-cluster witness (cross-checked against the exact pair listing, same
    threshold and rounding); every keep has no such witness (numpy
    recomputation over its cluster); assignments cover each vector once."""
    import numpy as np
    import pyarrow.parquet as pq

    from dbms_query_optimizer_spark.operators.dedup import (
        SEMDEDUP_TAU,
        q_dedup_embedding_cosine,
        q_dedup_semantic,
    )

    rows = q_dedup_semantic(spark, sf_dir).collect()
    exact = {
        (r["id_a"], r["id_b"]) for r in q_dedup_embedding_cosine(spark, sf_dir).collect()
    }

    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids))

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    vec = {
        int(i): np.asarray(list(v), dtype=np.float64)
        for i, v in zip(tbl["vec_id"], tbl["embedding"])
    }
    assert set(ids) == set(vec)

    def cos(a, b):
        return round(
            float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6
        )

    cluster_of = {r["vec_id"]: r["cluster"] for r in rows}
    n_drops = 0
    for r in rows:
        if r["keep"]:
            assert r["dup_of"] is None
            smaller = [
                i for i in ids if i < r["vec_id"] and cluster_of[i] == r["cluster"]
            ]
            assert all(cos(vec[i], vec[r["vec_id"]]) < SEMDEDUP_TAU for i in smaller)
        else:
            n_drops += 1
            w = r["dup_of"]
            assert w is not None and w < r["vec_id"]
            assert cluster_of[w] == r["cluster"]
            assert (w, r["vec_id"]) in exact  # same tau => must be an exact pair
    # the sf0.01 corpus has ~59 exact near-dup pairs; clustering must
    # co-locate at least one of them for the operator to be non-trivial
    assert n_drops > 0


def test_pca_projection_matches_numpy_oracle(spark, sf_dir):
    """Distributed PCA vs an independent numpy PCA over the raw parquet:
    projections agree to float-jitter tolerance, explained variance is
    descending, and each component's projections are centered."""
    import numpy as np
    import pyarrow.parquet as pq

    from dbms_query_optimizer_spark.operators.similarity import (
        PCA_K,
        q_embedding_pca_project,
    )

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    ids = np.array(tbl["vec_id"])
    X = np.array([list(v) for v in tbl["embedding"]], dtype=np.float64)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]

    mu = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    comps = vecs[:, ::-1][:, :PCA_K].T.copy()
    for c in comps:
        if c[int(np.abs(c).argmax())] < 0:
            c *= -1.0
    want = (X - mu) @ comps.T  # (n, k)

    rows = {r["vec_id"]: r for r in q_embedding_pca_project(spark, sf_dir).collect()}
    assert set(rows) == set(int(i) for i in ids)
    got = np.array(
        [[rows[int(i)][f"pc{k + 1}"] for k in range(PCA_K)] for i in ids]
    )
    assert np.abs(got - want).max() < 1e-3, np.abs(got - want).max()

    # descending explained variance, centered projections
    var = got.var(axis=0)
    assert all(var[k] >= var[k + 1] - 1e-9 for k in range(PCA_K - 1)), var
    assert np.abs(got.mean(axis=0)).max() < 1e-3

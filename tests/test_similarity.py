from __future__ import annotations

from pyspark.sql import functions as F

from pu4spark_spark.operators.similarity import (
    TOP_K,
    q_ann_cosine_topk,
    q_ann_ivf,
    q_ann_lsh_bucketed,
)

SF = "/root/testdata/sf0.001"


def test_topk_shape_and_ordering(spark):
    out = q_ann_cosine_topk(spark, SF).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(10))
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, TOP_K + 1))
        cosines = [r["cosine"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["neighbor_id"] != r["query_id"] for r in rows)


def test_lsh_candidates_are_a_sound_subset(spark):
    """LSH prunes candidates, so its best cosine per query can never
    beat the exact top-1, and every reported cosine must equal the
    exactly-computed cosine for that pair (same quantized math)."""
    exact = q_ann_cosine_topk(spark, SF)
    lsh = q_ann_lsh_bucketed(spark, SF)
    e_best = {
        r["query_id"]: r["cosine"]
        for r in exact.filter(F.col("rank") == 1).collect()
    }
    exact_all = {
        (r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact.collect()
    }
    l_rows = lsh.collect()
    assert len(l_rows) > 0
    for r in l_rows:
        assert r["cosine"] <= e_best[r["query_id"]] + 1e-12
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_all:  # overlap pairs must agree bit-for-bit
            assert r["cosine"] == exact_all[key]


def test_ivf_deterministic_and_sound(spark):
    """Seeded KMeans makes IVF fully deterministic; like LSH, a pruned
    search can never beat the exact top-1, and overlapping pairs carry
    bit-identical cosines (same quantized-integer math)."""
    a = sorted(tuple(r) for r in q_ann_ivf(spark, SF).collect())
    b = sorted(tuple(r) for r in q_ann_ivf(spark, SF).collect())
    assert a == b
    assert len(a) > 0
    exact = q_ann_cosine_topk(spark, SF)
    e_best = {
        r["query_id"]: r["cosine"]
        for r in exact.filter(F.col("rank") == 1).collect()
    }
    exact_all = {
        (r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact.collect()
    }
    for r in q_ann_ivf(spark, SF).collect():
        assert r["cosine"] <= e_best[r["query_id"]] + 1e-12
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_all:
            assert r["cosine"] == exact_all[key]


def test_int8_quantization_bounds(spark):
    from pu4spark_spark.operators.similarity import q_embedding_quantize_int8

    rows = q_embedding_quantize_int8(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert -127 <= r["q_min"] <= r["q_max"] <= 127
        assert r["amax"] > 0
        # the max-magnitude coordinate lands within one step of a rail:
        # amax·(127/amax) evaluates to 127 ± 1 ulp, so its floor is 126
        # or 127 (mirrored for negative)
        assert r["q_max"] >= 126 or r["q_min"] <= -126


def test_quantize_int8_zero_vector_guard(spark):
    """An all-zero embedding must quantize to the all-zero int8 vector
    (scale guard), not NaN-floor NULLs silently clamped away."""
    from pu4spark_spark.operators.similarity import quantize_int8_stats

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        ["vec_id", "embedding"],
    )
    out = {r["vec_id"]: r for r in quantize_int8_stats(df).collect()}
    assert out[1]["amax"] == 0.0
    assert (out[1]["q_min"], out[1]["q_max"], out[1]["q_sum"]) == (0, 0, 0)
    # sanity on a normal vector (amax=2, scale=63.5, floor discipline):
    # q = [63, -127, 31]
    assert (out[2]["q_min"], out[2]["q_max"], out[2]["q_sum"]) == (-127, 63, -33)


def test_gram_matrix_vs_numpy(spark):
    """The distributed Gram aggregation must equal numpy's q^T q over
    the identically-quantized matrix (exact integer equality)."""
    import numpy as np
    from pyspark.sql import functions as F

    from pu4spark_spark.operators.similarity import q_embedding_gram_matrix

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    vecs = np.array(
        [r.embedding for r in emb.select("embedding").collect()], dtype=np.float64
    )
    q = np.floor(vecs * 1000).astype(np.int64)
    ref = q.T @ q
    got = {
        (r.i, r.j): r.gram_int
        for r in q_embedding_gram_matrix(spark, sf).collect()
    }
    d = vecs.shape[1]
    assert len(got) == d * (d + 1) // 2
    for (i, j), v in got.items():
        assert v == ref[i, j], (i, j)


def test_pca_project_vs_numpy(spark):
    """The Gram-derived PCA projection must match an independent NumPy
    re-derivation (cov → eigh → project) on the same fixture, up to
    per-component sign (both implementations then pin the sign the
    same way, so signs must in fact agree too)."""
    import numpy as np

    from pu4spark_spark.operators.similarity import (
        PCA_K,
        q_embedding_pca_project,
    )

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    vecs = np.array([r.embedding for r in rows], dtype=np.float64)
    q = np.floor(vecs * 1000).astype(np.int64)
    n = len(q)
    second = (q.T @ q) / n / 1000.0**2
    mu = q.mean(axis=0) / 1000.0
    cov = second - np.outer(mu, mu)
    _w, v = np.linalg.eigh(cov)
    comps = v[:, ::-1][:, :PCA_K].T.copy()
    for row in comps:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    ref = (vecs - mu) @ comps.T

    got = {r.vec_id: r for r in q_embedding_pca_project(spark, sf).collect()}
    assert len(got) == n
    got_mat = np.array(
        [[got[i][f"proj{k}"] for k in range(PCA_K)] for i in ids]
    )
    # float32 source + differing summation order: tolerance, not bits
    assert np.allclose(got_mat, ref, atol=1e-9)


def test_pca_components_orthogonal_variance_ordered(spark):
    """Projected components must be (near-)uncorrelated with descending
    variance — the PCA contract, asserted on the projection output
    itself rather than on internals."""
    import numpy as np

    from pu4spark_spark.operators.similarity import (
        PCA_K,
        q_embedding_pca_project,
    )

    sf = "/root/testdata/sf0.001"
    out = q_embedding_pca_project(spark, sf).collect()
    mat = np.array([[r[f"proj{k}"] for k in range(PCA_K)] for r in out])
    c = np.cov(mat.T)
    var = np.diag(c).copy()
    # descending variance (quantization noise ⇒ loose monotone check)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(PCA_K - 1))
    off = c - np.diag(var)
    # cov is fitted on the QUANTIZED ints while the projection runs over
    # the raw floats, so decorrelation holds up to quantization noise
    # (measured ~2e-4 of the top variance on the fixture)
    assert np.abs(off).max() <= 1e-3 * var[0]


def test_ivf_recall_floor_on_fixture(spark):
    """The tuned default (nprobe=8, picked by ann_ivf_tuning) must
    clear the production recall bar on the fixture, and the metric
    algebra must be internally consistent."""
    from pu4spark_spark.operators.similarity import q_ann_ivf_recall

    row = q_ann_ivf_recall(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_queries"] >= 1
    assert 0.0 <= row["avg_recall"] <= 1.0
    # the old nprobe=2 default recalled ~0.36 on this near-isotropic
    # fixture; the r7 tuning table moved the default to 8, which
    # measures ~0.86 — gate the >=0.8 bar the default was chosen for
    assert row["avg_recall"] >= 0.8
    assert 0 <= row["min_matched"]


def test_norm_outliers_flag_consistency(spark):
    from pu4spark_spark.operators.similarity import q_embedding_norm_outliers

    rows = q_embedding_norm_outliers(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    for r in rows:
        assert r["is_outlier"] == (abs(r["z_norm"]) >= 2.0)
    # per-label z-scores are standardized: roughly centered, few outliers
    n_out = sum(r["is_outlier"] for r in rows)
    assert 0 < n_out < len(rows) * 0.2


def test_dim_variance_profile(spark):
    from pu4spark_spark.operators.similarity import q_embedding_dim_variance

    rows = q_embedding_dim_variance(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 64 and {r["dim"] for r in rows} == set(range(64))
    assert all(r["n"] == 500 and r["var_q"] > 0 for r in rows)


def test_binary_hamming_recall_bounds_and_codes(spark):
    """Recall of the 1-bit hamming path is a valid ratio, and the sign
    codes are exact: a vector's code halves must reproduce NumPy's
    bit-packing of its sign pattern."""
    import numpy as np

    from pu4spark_spark.operators.similarity import (
        _sign_code,
        q_ann_binary_hamming_recall,
    )
    from pu4spark_spark.sources import load_table

    row = q_ann_binary_hamming_recall(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_queries"] == 10
    assert 0.0 <= row["avg_recall"] <= 1.0
    assert 0 <= row["min_matched"] <= 5

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    got = emb.select(
        "vec_id",
        "embedding",
        _sign_code("embedding", 0, 32).alias("lo"),
        _sign_code("embedding", 32, 64).alias("hi"),
    ).limit(20).collect()
    for r in got:
        v = np.array(r["embedding"])
        lo = sum(1 << i for i in range(32) if v[i] >= 0)
        hi = sum(1 << (i - 32) for i in range(32, 64) if v[i] >= 0)
        assert (r["lo"], r["hi"]) == (lo, hi), r["vec_id"]


def test_cluster_size_histogram_conservation(spark):
    """The size histogram must conserve the corpus: Σ n_docs equals the
    document count, Σ(size·n_clusters) = Σ n_docs, and docs removed by
    keep-one-per-cluster = Σ (n_docs - n_clusters) over sizes ≥ 2."""
    from pu4spark_spark.operators.dedup import (
        q_dedup_cluster_size_histogram,
    )
    from pu4spark_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    rows = q_dedup_cluster_size_histogram(spark, sf).collect()
    n_docs_total = load_table(spark, "documents", sf).count()
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    for r in rows:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
    assert any(r["cluster_size"] == 1 for r in rows)  # singletons present


def test_knn_graph_mutuality_and_rank_bounds(spark):
    """Every edge must be reciprocal (rank_ab and rank_ba both ≤ K),
    appear once with a_id < b_id, and agree with an independently
    computed per-node top-K over the same bucket candidates."""
    from pu4spark_spark.operators.similarity import (
        KNN_K,
        LSH_DIMS,
        q_ann_knn_graph_mutual,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_ann_knn_graph_mutual(spark, sf).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["a_id"] < r["b_id"]
        assert 1 <= r["rank_ab"] <= KNN_K
        assert 1 <= r["rank_ba"] <= KNN_K
        assert -1.0 <= r["cosine"] <= 1.0
        key = (r["a_id"], r["b_id"])
        assert key not in seen
        seen.add(key)
    # reference: recompute knn lists in CPython over quantized vectors
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    import math

    qv = {
        r["vec_id"]: [math.floor(float(x) * 1000) for x in r["embedding"]]
        for r in emb
    }
    bucket = {
        r["vec_id"]: tuple(
            1 if r["embedding"][d] >= 0 else 0 for d in LSH_DIMS
        )
        for r in emb
    }
    by_bucket: dict = {}
    for vid, b in bucket.items():
        by_bucket.setdefault(b, []).append(vid)
    norm2 = {vid: sum(x * x for x in v) for vid, v in qv.items()}

    def cos(a, b):
        return sum(x * y for x, y in zip(qv[a], qv[b])) / (
            math.sqrt(norm2[a]) * math.sqrt(norm2[b])
        )

    knn = {}
    for b, vids in by_bucket.items():
        for a in vids:
            cands = sorted(
                ((cos(a, o), -o) for o in vids if o != a), reverse=True
            )[:KNN_K]
            knn[a] = {(-negid): i + 1 for i, (c, negid) in enumerate(cands)}
    expect = set()
    for a, nbrs in knn.items():
        for b in nbrs:
            if a < b and a in knn.get(b, {}):
                expect.add((a, b))
    assert seen == expect


def test_kmeans_exact_matches_numpy_reference(spark):
    """Re-derive the whole exact-k-means protocol in NumPy/CPython
    (coreset by md5 order, integer-rational argmin, empty-cluster
    carry) and require identical cluster rollups — pins the algorithm
    itself, independent of the DuckDB twin."""
    import hashlib

    import numpy as np

    from pu4spark_spark.operators.similarity import (
        KMEANS_K,
        KMEANS_ROUNDS,
        KMEANS_SAMPLE,
        q_embedding_kmeans_exact,
    )
    from pu4spark_spark.sources import load_table

    sf = "/root/testdata/sf0.01"
    rows = load_table(spark, "embeddings", sf).select(
        "vec_id", "embedding"
    ).collect()
    vecs = {
        r["vec_id"]: np.floor(
            np.array(r["embedding"], dtype=np.float64) * 1000
        ).astype(np.int64)
        for r in rows
    }
    order = sorted(
        vecs, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )
    coreset = order[:KMEANS_SAMPLE]
    cents = [(vecs[v].copy(), 1) for v in coreset[:KMEANS_K]]

    def assign(x, cents):
        best = None
        for j, (s, c) in enumerate(cents):
            num = (
                c * c * int(x @ x) - 2 * c * int(x @ s) + int(s @ s)
            )
            r = float(num) / float(c * c)
            if best is None or (r, j) < best[:2]:
                best = (r, j)
        return best[1]

    for _ in range(KMEANS_ROUNDS):
        groups = {}
        for v in coreset:
            groups.setdefault(assign(vecs[v], cents), []).append(v)
        cents = [
            (
                np.sum([vecs[v] for v in groups[j]], axis=0),
                len(groups[j]),
            )
            if j in groups
            else cents[j]
            for j in range(KMEANS_K)
        ]
    final = {}
    for v, x in vecs.items():
        final.setdefault(assign(x, cents), []).append(v)
    want = {
        j: (
            len(ms),
            min(ms),
            max(ms),
            cents[j][1],
            int(cents[j][0] @ cents[j][0]),
        )
        for j, ms in final.items()
    }
    got = {
        r["cluster_id"]: (
            r["n_members"],
            r["first_vec"],
            r["last_vec"],
            r["sample_mass"],
            r["centroid_norm2"],
        )
        for r in q_embedding_kmeans_exact(spark, sf).collect()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == len(vecs)


def test_ivf_exact_recall_floor(spark):
    """The value-checked IVF (k=8, nprobe=2) must still be a USEFUL
    index: recall@5 vs the exhaustive cosine top-5 >= 0.5 on the
    fixture (approximation is allowed to miss neighbors — silently
    returning garbage is not)."""
    from pu4spark_spark.operators.similarity import (
        TOP_K,
        q_ann_cosine_topk,
        q_ann_ivf_exact_topk,
    )

    sf = "/root/testdata/sf0.01"
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in q_ann_cosine_topk(spark, sf).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in q_ann_ivf_exact_topk(spark, sf).collect()
    }
    assert len(exact) > 0
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.5, recall
    # per-query contract: at most TOP_K rows, ranks well-formed
    from collections import Counter

    per_q = Counter(q for q, _ in ivf)
    assert all(n <= TOP_K for n in per_q.values())


def test_ranking_eval_rerank_dominates_retrieve(spark):
    """The eval's whole point: exact-cosine reranking must not degrade
    ranking quality vs the raw hamming retrieve order.  Mean nDCG@k of
    the rerank stage >= retrieve stage, and per-row metrics are
    well-formed (ndcg in [0,1], rr consistent with first_rel_rank)."""
    from pu4spark_spark.operators.similarity import (
        TOP_K,
        q_ann_ranking_eval,
    )

    rows = q_ann_ranking_eval(spark, "/root/testdata/sf0.001").collect()
    by_stage: dict[str, list] = {"retrieve": [], "rerank": []}
    for r in rows:
        by_stage[r["stage"]].append(r)
        assert 0.0 <= r["ndcg"] <= 1.0 + 1e-12
        assert 0.0 <= r["ap"] <= 1.0 + 1e-12
        assert 0 <= r["n_rel"] <= TOP_K
        if r["first_rel_rank"] == 0:
            assert r["rr"] == 0.0 and r["n_rel"] == 0 and r["ap"] == 0.0
        else:
            assert abs(r["rr"] - 1.0 / r["first_rel_rank"]) < 1e-15
    n_q = len(by_stage["retrieve"])
    assert n_q == len(by_stage["rerank"]) > 0
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    for metric in ("ndcg", "rr", "ap"):
        assert mean([r[metric] for r in by_stage["rerank"]]) >= mean(
            [r[metric] for r in by_stage["retrieve"]]
        ), metric


def test_cosine_topk_randomized_vs_bruteforce(spark):
    """Randomized-input property test for the exact ANN core (5 seeds):
    cosine_topk over random integer-quantized vectors — with planted
    DUPLICATE vectors so cosine ties are real — must equal a CPython
    brute-force oracle computing the identical IEEE expression
    (exact int64 dot, then dot/(sqrt*sqrt)) under the identical
    (cosine DESC, vec_id ASC) total order."""
    import math
    import random

    from pu4spark_spark.operators.similarity import cosine_topk

    for seed in (5, 13, 29, 37, 53):
        rng = random.Random(seed)
        vecs = {}
        for i in range(36):
            vecs[i] = [rng.randint(-127, 127) for _ in range(8)]
        # planted duplicates: exact cosine ties, broken by vec_id
        for i, src in enumerate(rng.sample(sorted(vecs), 4)):
            vecs[36 + i] = list(vecs[src])
        rows = [
            (i, v, sum(x * x for x in v)) for i, v in vecs.items()
        ]
        base = spark.createDataFrame(
            rows, "vec_id bigint, q array<bigint>, norm2 bigint"
        )
        n_queries = 6
        got = {
            (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
            for r in cosine_topk(
                base, base.filter("vec_id < 6"), k=5
            ).collect()
        }

        def cos(a, b):
            d = sum(x * y for x, y in zip(vecs[a], vecs[b]))
            return d / (
                math.sqrt(sum(x * x for x in vecs[a]))
                * math.sqrt(sum(x * x for x in vecs[b]))
            )

        for qid in range(n_queries):
            cand = sorted(
                ((cos(qid, n), n) for n in vecs if n != qid),
                key=lambda t: (-t[0], t[1]),
            )[:5]
            for rank, (c, n) in enumerate(cand, start=1):
                gn, gc = got[(qid, rank)]
                assert gn == n, (seed, qid, rank, gn, n)
                assert gc == c, (seed, qid, rank, gc, c)

from __future__ import annotations

from pyspark.sql import functions as F

from pu4spark_spark.operators.dedup import (
    dedup_keep_first,
    minhash_bands,
    q_dedup_minhash_lsh,
    simhash_fingerprints,
)
from pu4spark_spark.functions.textfns import tokens, word_shingles


def test_dedup_keep_first_planted(spark):
    df = spark.createDataFrame(
        [(1, "k", 10), (2, "k", 5), (3, "j", 7)], ["id", "key", "v"]
    )
    out = dedup_keep_first(df, ["key"], [F.asc("v"), F.asc("id")])
    got = {r["key"]: r["id"] for r in out.collect()}
    assert got == {"k": 2, "j": 3}


def test_minhash_detects_planted_near_dup(spark):
    text = " ".join(f"w{i}" for i in range(50))
    near = " ".join(f"w{i}" for i in range(49)) + " zz"  # 1-token edit
    far = " ".join(f"x{i}" for i in range(50))
    docs = spark.createDataFrame(
        [(1, text), (2, near), (3, far)], ["doc_id", "text"]
    )
    base = docs.select(
        "doc_id", F.array_distinct(word_shingles(tokens("text"))).alias("sh")
    )
    bands = minhash_bands(base)
    pairs = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_pos") == F.col("b.band_pos"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .collect()
    )
    assert {(r[0], r[1]) for r in pairs} == {(1, 2)}


def _py_simhash64(text: str) -> int:
    """Independent CPython reference: 64-bit SimHash over whitespace
    tokens, bit j from nibble j//4 / sub-bit j%4 of md5(token), result
    as a SIGNED 64-bit int (bit 63 = sign bit, matching Spark's long
    and DuckDB's BIGINT)."""
    import hashlib

    toks = text.split(" ")
    n = len(toks)
    cnt = [0] * 64
    for t in toks:
        h = hashlib.md5(t.encode()).hexdigest()
        for j in range(64):
            if (int(h[j // 4], 16) >> (j % 4)) & 1:
                cnt[j] += 1
    fp = 0
    for j in range(64):
        if 2 * cnt[j] > n:
            fp |= 1 << j
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def test_simhash_identical_docs_share_fingerprint(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "q r s t u v")],
        ["doc_id", "text"],
    )
    fp = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    assert fp[1] == fp[2] != fp[3]
    # exact agreement with the independent CPython reference (third
    # engine beside the DuckDB oracle), including the signed bit-63
    # encoding
    assert fp[1] == _py_simhash64("a b c d e f")
    assert fp[3] == _py_simhash64("q r s t u v")


def test_minhash_lsh_query_on_fixture(spark):
    out = q_dedup_minhash_lsh(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    # every reported pair must meet the verification threshold
    assert all(r["jaccard"] >= 0.5 for r in rows)
    assert all(r["a_id"] < r["b_id"] for r in rows)


def test_minhash_capped_is_subset_of_uncapped(spark):
    from pu4spark_spark.operators.dedup import q_dedup_minhash_capped

    sf = "/root/testdata/sf0.001"
    full = {
        (r["a_id"], r["b_id"]) for r in q_dedup_minhash_lsh(spark, sf).collect()
    }
    capped_rows = q_dedup_minhash_capped(spark, sf).collect()
    capped = {(r["a_id"], r["b_id"]) for r in capped_rows}
    # skipping hot buckets can only LOSE pairs, never invent them, and
    # every surviving pair still meets the verify threshold
    assert capped <= full
    assert all(r["jaccard"] >= 0.5 for r in capped_rows)


def test_minhash_capped_drops_hot_bucket_pairs(spark):
    from pu4spark_spark.operators.dedup import BAND_CAP, q_dedup_minhash_capped

    # 4 identical docs: every band bucket they share has size 4 > cap,
    # so ALL their pairs ride only hot buckets and must be dropped;
    # the separate planted near-pair (5,6) lives in size-2 buckets and
    # must survive
    text = " ".join(f"w{i}" for i in range(50))
    other = " ".join(f"y{i}" for i in range(49)) + " zz"
    near = " ".join(f"y{i}" for i in range(49)) + " qq"
    docs = spark.createDataFrame(
        [(i, text) for i in range(1, 5)] + [(5, other), (6, near)],
        ["doc_id", "text"],
    )
    import pu4spark_spark.operators.dedup as dd

    assert BAND_CAP < 4
    orig = dd._doc_shingle_sets

    def fake(spark_, sf_dir):
        from pu4spark_spark.functions.textfns import tokens, word_shingles

        return docs.select(
            "doc_id",
            F.array_distinct(word_shingles(tokens("text"))).alias("sh"),
        )

    dd._doc_shingle_sets = fake
    try:
        got = {
            (r["a_id"], r["b_id"])
            for r in q_dedup_minhash_capped(spark, "ignored").collect()
        }
    finally:
        dd._doc_shingle_sets = orig
    assert got == {(5, 6)}


def test_connected_components_path_star_disjoint(spark):
    """Min-label propagation must reach the fixpoint on a long path
    (needs multiple rounds), a star, and keep disjoint components
    apart."""
    from pu4spark_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        # path 1-2-3-4-5 (worst case for propagation depth), star
        # 10-{11,12,13}, disjoint pair 20-21
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (10, 13), (20, 21)],
        ["a_id", "b_id"],
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }


def test_connected_components_random_vs_union_find(spark):
    """Hypothesis: min-label propagation must equal a driver-side
    union-find on random edge lists (few examples — each spins Spark
    jobs)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pu4spark_spark.operators.dedup import connected_components

    def uf_components(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=15),
                st.integers(min_value=0, max_value=15),
            ).filter(lambda p: p[0] != p[1]),
            min_size=1,
            max_size=20,
        )
    )
    def check(edges):
        pairs = spark.createDataFrame(
            [(min(a, b), max(a, b)) for a, b in edges], ["a_id", "b_id"]
        )
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(pairs).collect()
        }
        assert got == uf_components(edges)

    check()


def test_incremental_verdicts_partition_batch(spark):
    """Every batch doc gets exactly one verdict, and verdicts are
    consistent: exact dups share a content hash with the corpus, kept
    docs never do."""
    from pyspark.sql import functions as F

    from pu4spark_spark.operators.dedup import (
        INCR_BATCH_MOD,
        q_dedup_incremental,
    )
    from pu4spark_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    out = q_dedup_incremental(spark, sf).collect()
    verdicts = {}
    for r in out:
        assert r["doc_id"] not in verdicts, "doc judged twice"
        verdicts[r["doc_id"]] = r["verdict"]
    docs = load_table(spark, "documents", sf)
    batch_ids = {
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") % INCR_BATCH_MOD == 0).collect()
    }
    assert set(verdicts) == batch_ids
    assert set(verdicts.values()) <= {"kept", "exact_dup", "near_dup"}
    # exact verdicts agree with a direct hash comparison
    hashes = {
        r["doc_id"]: r["h"]
        for r in docs.select("doc_id", F.md5("text").alias("h")).collect()
    }
    corpus_hashes = {h for d, h in hashes.items() if d not in batch_ids}
    for d, v in verdicts.items():
        if v == "exact_dup":
            assert hashes[d] in corpus_hashes
        elif v == "kept":
            assert hashes[d] not in corpus_hashes


def test_minhash_tiny_docs_never_pair(spark):
    """Docs with fewer than 3 tokens have an empty shingle set: they
    must produce NO band rows (explode drops them) and therefore no
    candidate pairs — while real duplicates beside them still pair.
    This pins the documented output-equivalence of the explode-based
    signature path for sub-shingle docs."""
    from pyspark.sql import functions as F

    from pu4spark_spark.operators.dedup import minhash_bands

    docs = spark.createDataFrame(
        [
            (1, "only two"),
            (2, "only two"),
            (3, "a proper document with enough tokens to shingle"),
            (4, "a proper document with enough tokens to shingle"),
        ],
        ["doc_id", "text"],
    )
    from pu4spark_spark.functions.textfns import tokens, word_shingles

    base = docs.select(
        "doc_id",
        F.array_distinct(word_shingles(tokens("text"))).alias("sh"),
    )
    bands = minhash_bands(base)
    by_doc = {
        r["doc_id"]: r["n"]
        for r in bands.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert 1 not in by_doc and 2 not in by_doc  # no bands for tiny docs
    assert by_doc[3] == 4 and by_doc[4] == 4  # 4 bands each
    pairs = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_pos") == F.col("b.band_pos"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .collect()
    )
    assert {(r[0], r[1]) for r in pairs} == {(3, 4)}


# -- triangle enumeration -------------------------------------------------

def _brute_triangles(edges):
    import itertools

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    out = set()
    for x, y, z in itertools.combinations(nodes, 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            out.add((x, y, z))
    return out


def test_triangle_enumerate_matches_bruteforce(spark):
    """Degree-ordered enumeration = naive all-triples on a graph mixing
    a 4-clique (4 triangles), a chain (0), a star (0), and a detached
    triangle — including skewed degrees so the orientation logic is
    actually exercised."""
    from pu4spark_spark.operators.dedup import triangle_enumerate

    edges = (
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]  # 4-clique
        + [(10, 11), (11, 12), (12, 13)]  # chain
        + [(20, 21), (20, 22), (20, 23), (20, 24)]  # star hub
        + [(30, 31), (31, 32), (30, 32)]  # triangle
        + [(20, 1)]  # bridge between hub and clique
    )
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {
        (r.x_id, r.y_id, r.z_id)
        for r in triangle_enumerate(df).collect()
    }
    assert got == _brute_triangles(edges)
    # every triangle emitted exactly once
    rows = triangle_enumerate(df).collect()
    assert len(rows) == len(got)


def test_triangle_enumerate_empty_graph(spark):
    from pu4spark_spark.operators.dedup import triangle_enumerate

    df = spark.createDataFrame([(1, 2), (3, 4)], "a_id long, b_id long")
    assert triangle_enumerate(df).count() == 0


# -- PageRank -------------------------------------------------------------

def _ref_pagerank(edges, damping=0.85, n_iters=10):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = len(adj)
    pr = {v: 1.0 / n for v in adj}
    for _ in range(n_iters):
        new = {}
        for v in adj:
            s = sum(pr[u] / len(adj[u]) for u in adj[v])
            new[v] = (1.0 - damping) / n + damping * s
        pr = new
    return pr


def test_pagerank_matches_cpython_reference(spark):
    """Fixed-iteration power iteration = the plain CPython loop to 1e-9
    relative, on a graph with asymmetric degrees (star + chain + clique
    bridge) where rank differences are material."""
    from pu4spark_spark.operators.dedup import pagerank

    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3),       # dense corner
        (4, 5), (5, 6), (6, 7),               # chain
        (8, 1), (8, 2), (8, 3), (8, 9),       # hub with a pendant
    ]
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {r.doc_id: r.pagerank for r in pagerank(df).collect()}
    want = _ref_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) <= 1e-9 * max(1.0, abs(want[v]))
    # ranks form a probability-ish distribution (mass conservation of
    # the power iteration on a graph with no dangling nodes)
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_semantic_keep_verdicts_match_pair_graph(spark):
    from pu4spark_spark.operators.dedup import (
        q_dedup_embedding_cosine,
        q_dedup_semantic_keep,
    )

    sf = "/root/testdata/sf0.001"
    verdicts = q_dedup_semantic_keep(spark, sf).collect()
    pairs = q_dedup_embedding_cosine(spark, sf).collect()
    dominated = {}
    for r in pairs:
        cur = dominated.get(r["b_id"])
        dominated[r["b_id"]] = r["a_id"] if cur is None else min(cur, r["a_id"])
    assert len(verdicts) == 500  # one verdict per vector
    for v in verdicts:
        if v["vec_id"] in dominated:
            assert v["action"] == "drop"
            assert v["kept_by"] == dominated[v["vec_id"]] < v["vec_id"]
        else:
            assert v["action"] == "keep" and v["kept_by"] is None
    # the fixture must actually exercise both verdicts
    acts = {v["action"] for v in verdicts}
    assert acts == {"keep", "drop"}


def test_band_tuning_monotone_tradeoffs(spark):
    """More rows per band (higher precision) can only shrink the
    candidate volume; (r=1,b=8) upper-bounds everything."""
    from pu4spark_spark.operators.dedup import q_dedup_band_tuning

    rows = {
        r["rows_per_band"]: r
        for r in q_dedup_band_tuning(spark, "/root/testdata/sf0.001").collect()
    }
    assert set(rows) == {1, 2, 4, 8}
    cands = [rows[r]["candidate_pairs"] for r in (1, 2, 4, 8)]
    assert cands == sorted(cands, reverse=True)
    assert all(rows[r]["hottest_bucket"] >= 1 for r in rows)


def test_bow_cosine_agrees_with_numpy(spark):
    """The sparse postings dot product must equal NumPy's dense
    bag-of-words cosine for every emitted pair (and the threshold
    must hold)."""
    from collections import Counter

    import numpy as np

    from pu4spark_spark.operators.dedup import (
        BOW_COSINE_THRESHOLD,
        q_dedup_bow_cosine,
    )
    from pu4spark_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    rows = q_dedup_bow_cosine(spark, sf).collect()
    assert rows, "fixture has near-dup candidates; expected verdicts"
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, "documents", sf).collect()
    }

    def cos(a, b):
        ca, cb = Counter(a.split(" ")), Counter(b.split(" "))
        dot = sum(ca[t] * cb[t] for t in ca.keys() & cb.keys())
        na = np.sqrt(sum(v * v for v in ca.values()))
        nb = np.sqrt(sum(v * v for v in cb.values()))
        return dot, dot / (na * nb)

    for r in rows:
        dot, c = cos(texts[r["a_id"]], texts[r["b_id"]])
        assert r["dot"] == dot
        assert abs(r["cosine"] - c) < 1e-12
        assert r["cosine"] >= BOW_COSINE_THRESHOLD


def test_pagerank_empty_graph_returns_empty(spark):
    """An all-unique corpus yields zero verified pairs; pagerank must
    return an empty typed frame instead of dividing by a zero node
    count on the driver."""
    from pu4spark_spark.operators.dedup import pagerank

    empty = spark.createDataFrame([], "a_id long, b_id long")
    out = pagerank(empty)
    assert out.columns == ["doc_id", "pagerank"]
    assert out.count() == 0


def test_incremental_cc_equals_full_recompute(spark):
    """The incremental cluster maintenance must be row-identical to the
    full-graph recompute, and the fixture must actually exercise the
    interesting paths: mixed batch+corpus components (the relabel map
    fired) and untouched corpus clusters (labels preserved verbatim)."""
    from pu4spark_spark.operators.dedup import (
        INCR_BATCH_MOD,
        q_dedup_clusters,
        q_dedup_clusters_incremental,
    )

    sf = "/root/testdata/sf0.001"
    full = {(r["doc_id"], r["cluster_id"])
            for r in q_dedup_clusters(spark, sf).collect()}
    inc = {(r["doc_id"], r["cluster_id"])
           for r in q_dedup_clusters_incremental(spark, sf).collect()}
    spark.catalog.clearCache()
    assert inc == full and len(full) > 0
    by_cluster = {}
    for doc, cl in full:
        by_cluster.setdefault(cl, []).append(doc)
    mixed = [
        c for c, docs in by_cluster.items()
        if any(d % INCR_BATCH_MOD == 0 for d in docs)
        and any(d % INCR_BATCH_MOD != 0 for d in docs)
    ]
    pure_corpus = [
        c for c, docs in by_cluster.items()
        if all(d % INCR_BATCH_MOD != 0 for d in docs)
    ]
    assert mixed, "fixture exercises no batch-corpus merge"
    assert pure_corpus, "fixture exercises no untouched corpus cluster"


def test_merge_into_clusters_randomized_equivalence(spark):
    """Randomized algebra check of the incremental-CC merge: on random
    graphs with a random corpus/batch node split, merging the
    batch-touching edges into the corpus-only clustering must equal
    connected components over the full edge set — including
    cluster-bridging edges, batch-only components, and corpus
    singletons pulled in by a new edge."""
    import random

    from pu4spark_spark.operators.dedup import (
        connected_components,
        merge_into_clusters,
    )

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        n = 40
        batch = {i for i in range(n) if rng.random() < 0.3}
        edges = set()
        while len(edges) < 35:
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        corpus_pairs = [
            (a, b) for a, b in edges if a not in batch and b not in batch
        ]
        new_pairs = [
            (a, b) for a, b in edges if a in batch or b in batch
        ]
        if not corpus_pairs or not new_pairs:
            continue
        ddl = "a_id long, b_id long"
        full = {
            (r["doc_id"], r["cluster_id"])
            for r in connected_components(
                spark.createDataFrame(sorted(edges), ddl)
            ).collect()
        }
        inc = {
            (r["doc_id"], r["cluster_id"])
            for r in merge_into_clusters(
                connected_components(
                    spark.createDataFrame(sorted(corpus_pairs), ddl)
                ),
                spark.createDataFrame(sorted(new_pairs), ddl),
            ).collect()
        }
        spark.catalog.clearCache()
        assert inc == full, f"seed={seed}"


def test_recursive_dup_hops_matches_cpython_bfs(spark):
    """The in-engine recursive-CTE BFS must equal a CPython BFS from
    the same locally-canonical seeds, capped at the same depth."""
    from pu4spark_spark.operators.dedup import (
        DUP_HOPS_MAX,
        q_dedup_minhash_lsh,
        q_sql_recursive_dup_hops,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: r["hops"]
        for r in q_sql_recursive_dup_hops(spark, sf).collect()
    }
    pairs = [
        (r["a_id"], r["b_id"])
        for r in q_dedup_minhash_lsh(spark, sf).collect()
    ]
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seeds = [u for u, nbrs in adj.items() if min(nbrs) > u]
    dist = {u: 0 for u in seeds}
    frontier = list(seeds)
    for d in range(1, DUP_HOPS_MAX + 1):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    assert got == dist
    assert pairs, "fixture must produce a non-trivial graph"


def test_kcore_matches_cpython_peeling(spark):
    """Engine peel rounds and core membership must equal the CPython
    peeling reference on the same fixture graph."""
    from pu4spark_spark.operators.dedup import (
        KCORE_K,
        q_dedup_kcore,
        q_dedup_minhash_lsh,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: (r["peel_round"], r["in_core"])
        for r in q_dedup_kcore(spark, sf).collect()
    }
    pairs = [
        (r["a_id"], r["b_id"])
        for r in q_dedup_minhash_lsh(spark, sf).collect()
    ]
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    peel = {}
    live = {u: set(vs) for u, vs in adj.items()}
    rnd = 0
    while True:
        rnd += 1
        victims = [u for u, vs in live.items() if len(vs) < KCORE_K]
        if not victims:
            break
        for u in victims:
            peel[u] = rnd
            for v in live[u]:
                live[v].discard(u)
            del live[u]
    expect = {
        u: (peel.get(u), u not in peel) for u in adj
    }
    assert got == expect


def test_pagerank_int_matches_python_fixed_point(spark):
    """The integer fixed-point recurrence re-derived in pure Python on
    a hand graph must match pagerank_int EXACTLY (no tolerance — the
    operator's whole point)."""
    from pu4spark_spark.operators.dedup import (
        PAGERANK_INT_ITERS,
        PAGERANK_INT_SCALE,
        pagerank_int,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4), (2, 4)], "a_id long, b_id long"
    )
    got = {
        r["doc_id"]: r["score"] for r in pagerank_int(pairs).collect()
    }

    edges = {}
    for a, b in [(1, 2), (2, 3), (3, 4), (1, 4), (2, 4)]:
        edges.setdefault(a, set()).add(b)
        edges.setdefault(b, set()).add(a)
    n = len(edges)
    base = (15 * PAGERANK_INT_SCALE) // (100 * n)
    score = {v: PAGERANK_INT_SCALE // n for v in edges}
    for _ in range(PAGERANK_INT_ITERS):
        contrib = {v: 0 for v in edges}
        for u, nbrs in edges.items():
            c = score[u] // len(nbrs)
            for v in nbrs:
                contrib[v] += c
        score = {v: base + (85 * contrib[v]) // 100 for v in edges}
    assert got == score
    # hub ordering: 2 and 4 (degree 3) outrank 1 and 3 (degree 2)
    assert min(score[2], score[4]) > max(score[1], score[3])


def test_star_cc_equals_min_label_on_random_graphs(spark):
    """large-star/small-star CC must produce the exact min-label
    clustering on randomized graphs (same contract as the recursive
    oracle), including multi-component and singleton-free shapes."""
    import random

    from pu4spark_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(90210)
    for trial in range(4):
        n = rng.randint(8, 40)
        edges = [
            (rng.randint(0, n - 1), rng.randint(0, n - 1))
            for _ in range(rng.randint(4, 2 * n))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        df = spark.createDataFrame(edges, "a_id bigint, b_id bigint")
        want = {
            (r.doc_id, r.cluster_id)
            for r in connected_components(df).collect()
        }
        got = {
            (r.doc_id, r.cluster_id)
            for r in connected_components_star(df).collect()
        }
        assert got == want, f"trial {trial}: star != min-label"


def test_star_cc_logarithmic_rounds_on_chain(spark):
    """The reason the variant exists: a 64-node chain (diameter 63)
    must converge in O(log n) alternating rounds — min-label would
    need ~63.  The bound is generous (2·log2 n + 4) to stay stable
    across tie-breaking details; the point is ≪ diameter."""
    import math

    from pu4spark_spark.operators.dedup import connected_components_star

    n = 64
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a_id bigint, b_id bigint"
    )
    rounds: list[int] = []
    labels = connected_components_star(chain, rounds_out=rounds)
    got = {(r.doc_id, r.cluster_id) for r in labels.collect()}
    assert got == {(i, 0) for i in range(n)}
    assert rounds[0] <= 2 * int(math.log2(n)) + 4, rounds


def _random_corpus(seed: int):
    """(doc_id, token-set) corpus with planted near-dups and a hot
    cluster: a small vocabulary forces genuine J ≥ 0.5 pairs, the
    near-identical clones force hot LSH buckets past BAND_CAP."""
    import random

    rng = random.Random(seed)
    vocab = [f"t{i:02d}" for i in range(24)]
    docs: dict[int, frozenset] = {}
    nid = 0
    for _ in range(18):
        docs[nid] = frozenset(rng.sample(vocab, rng.randint(3, 9)))
        nid += 1
    # planted near-dup pairs: copy + drop/add one token
    for base_id in rng.sample(sorted(docs), 4):
        s = set(docs[base_id])
        if len(s) > 3 and rng.random() < 0.5:
            s.discard(rng.choice(sorted(s)))
        else:
            s.add(rng.choice(vocab))
        docs[nid] = frozenset(s)
        nid += 1
    # hot cluster: 6 identical docs — every band bucket size ≥ 6
    hot = frozenset(rng.sample(vocab, 6))
    for _ in range(6):
        docs[nid] = hot
        nid += 1
    return docs


def _jac(a: frozenset, b: frozenset) -> float:
    return len(a & b) / len(a | b)


def test_dedup_randomized_property_matrix(spark):
    """Randomized-input property tests for the dedup verify matrix
    (5 seeds), against a brute-force python oracle:

    1. PREFIX-FILTER COMPLETENESS: prefix_filter_pairs at τ=0.5 equals
       the exact all-pairs τ-Jaccard join — the AllPairs/PPJoin
       length + positional prunes provably lose nothing.
    2. LSH SOUNDNESS: the banded-candidate verify equals brute-force
       RESTRICTED to banded candidates (the verify never invents or
       keeps a sub-threshold pair), hence ⊆ brute force.
    3. CAPPED-LSH RECALL ACCOUNTING: with hot buckets (> BAND_CAP)
       dropped, the surviving pairs are EXACTLY the verified pairs
       still reachable through some small bucket — the documented
       recall loss, nothing more, nothing less.
    """
    from pyspark.sql import functions as F

    from pu4spark_spark.functions.textfns import jaccard_sets
    from pu4spark_spark.operators.dedup import (
        BAND_CAP,
        JACCARD_THRESHOLD,
        band_self_join_candidates,
        minhash_bands,
        prefix_filter_pairs,
    )

    tau = JACCARD_THRESHOLD  # 0.5 — shared by prefix + LSH paths

    def verified_pairs(cand, base):
        sa = base.select(
            F.col("doc_id").alias("a_id"), F.col("sh").alias("sh_a")
        )
        sb = base.select(
            F.col("doc_id").alias("b_id"), F.col("sh").alias("sh_b")
        )
        return {
            (r["a_id"], r["b_id"])
            for r in cand.join(sa, "a_id")
            .join(sb, "b_id")
            .filter(jaccard_sets(F.col("sh_a"), F.col("sh_b")) >= tau)
            .select("a_id", "b_id")
            .collect()
        }

    for seed in (7, 11, 23, 31, 47):
        docs = _random_corpus(seed)
        base = spark.createDataFrame(
            [(i, sorted(s)) for i, s in docs.items()],
            "doc_id bigint, sh array<string>",
        )
        ids = sorted(docs)
        brute = {
            (a, b): _jac(docs[a], docs[b])
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if _jac(docs[a], docs[b]) >= tau
        }

        # 1 — prefix filter is EXACT (complete and sound)
        got = {
            (r["a_id"], r["b_id"]): r["jaccard"]
            for r in prefix_filter_pairs(base, tau).collect()
        }
        assert set(got) == set(brute), f"seed {seed}: prefix-filter"
        for k, v in got.items():
            assert abs(v - brute[k]) < 1e-9, (seed, k, v, brute[k])

        # 2 — LSH verify == brute ∩ candidates (soundness; ⊆ brute)
        band_rows = minhash_bands(base).collect()
        bands_df = spark.createDataFrame(
            band_rows, "doc_id bigint, band_pos int, band_hash string"
        )
        cand = {
            (r["a_id"], r["b_id"])
            for r in band_self_join_candidates(bands_df).collect()
        }
        lsh = verified_pairs(band_self_join_candidates(bands_df), base)
        assert lsh == set(brute) & cand, f"seed {seed}: lsh verify"
        assert lsh <= set(brute), f"seed {seed}: lsh ⊄ brute"

        # 3 — capped LSH drops EXACTLY the pairs whose every shared
        # band sits in a hot bucket (python-recomputed accounting)
        from collections import Counter, defaultdict

        bucket_n = Counter((r["band_pos"], r["band_hash"]) for r in band_rows)
        by_bucket = defaultdict(set)
        for r in band_rows:
            by_bucket[(r["band_pos"], r["band_hash"])].add(r["doc_id"])
        reachable = set()
        for key, members in by_bucket.items():
            if bucket_n[key] <= BAND_CAP:
                ms = sorted(members)
                for i, a in enumerate(ms):
                    for b in ms[i + 1 :]:
                        reachable.add((a, b))
        kept_rows = [
            r
            for r in band_rows
            if bucket_n[(r["band_pos"], r["band_hash"])] <= BAND_CAP
        ]
        assert len(kept_rows) < len(band_rows), (
            f"seed {seed}: hot cluster failed to overflow any bucket"
        )
        kept_df = spark.createDataFrame(
            kept_rows, "doc_id bigint, band_pos int, band_hash string"
        )
        capped = verified_pairs(band_self_join_candidates(kept_df), base)
        assert capped == lsh & reachable, f"seed {seed}: capped recall"

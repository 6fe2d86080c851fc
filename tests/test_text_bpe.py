"""Independent CPython reference for the BPE merge-learning loop
(three-engine discipline, SURVEY.md §5: the Spark operator must agree
with a from-scratch reference implementation, not just with itself)."""

from __future__ import annotations

import duckdb


def _reference_bpe(word_counts: dict[str, int], k: int):
    """Plain-Python BPE trainer over a word-frequency table: each round
    counts adjacent symbol pairs weighted by word count, merges the
    most frequent (ties broken by pair lexicographic order),
    left-to-right non-overlapping application."""
    vocab = {w: [c for c in w] for w in word_counts}
    merges = []
    for rank in range(k):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            wc = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + wc
        if not counts:
            break
        (left, right), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, left, right, left + right, freq))
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            vocab[w] = out
    return merges


def test_bpe_learn_merges_matches_cpython(spark):
    from pu4spark_spark.operators.text import (
        BPE_MERGES,
        q_text_bpe_learn_merges,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT w, COUNT(*) FROM (
          SELECT unnest(string_split(text, ' ')) AS w
          FROM '{sf}/documents.parquet')
        WHERE len(w) >= 2 GROUP BY w
        """
    ).fetchall()
    ref = _reference_bpe(dict(rows), BPE_MERGES)

    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_freq"])
        for r in q_text_bpe_learn_merges(spark, sf)
        .orderBy("rank")
        .collect()
    ]
    assert got == ref
    assert len(got) == BPE_MERGES  # fixture corpus has ≥10 mergeable pairs


def test_bpe_apply_merge_overlapping_runs(spark):
    """Greedy left-to-right non-overlap: merging (a,a) over 'aaaa' gives
    [aa, aa]; over 'aaa' gives [aa, a]."""
    from pyspark.sql import functions as F

    from pu4spark_spark.operators.text import _bpe_apply_merge

    df = spark.createDataFrame(
        [(1, ["a", "a", "a", "a"]), (2, ["a", "a", "a"]), (3, ["b", "a"])],
        ["id", "syms"],
    )
    out = {
        r["id"]: r["m"]
        for r in df.select(
            "id", _bpe_apply_merge(F.col("syms"), "a", "a").alias("m")
        ).collect()
    }
    assert out[1] == ["aa", "aa"]
    assert out[2] == ["aa", "a"]
    assert out[3] == ["b", "a"]


def test_bpe_encode_matches_cpython(spark):
    """Encoding with the learned merge table must match the reference
    tokenizer applied per doc (vocab-level apply ≡ occurrence-level
    apply, since merges never cross word boundaries)."""
    import duckdb

    from pu4spark_spark.operators.text import BPE_MERGES, q_text_bpe_encode

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    wc_rows = con.execute(
        f"""
        SELECT w, COUNT(*) FROM (
          SELECT unnest(string_split(text, ' ')) AS w
          FROM '{sf}/documents.parquet')
        WHERE len(w) >= 2 GROUP BY w
        """
    ).fetchall()
    merges = _reference_bpe(dict(wc_rows), BPE_MERGES)

    def encode(word: str) -> int:
        syms = [c for c in word]
        for _rank, left, right, _m, _f in merges:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            syms = out
        return len(syms)

    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
    ).fetchall()
    want = {}
    for doc_id, text in docs:
        words = text.split(" ")
        want[doc_id] = (len(words), sum(encode(w) for w in words))

    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in q_text_bpe_encode(spark, sf).collect()
    }
    assert got == want

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pu4spark_spark.operators.multimodal import (
    decode_image,
    extract_features,
    fake_features,
    pack_documents,
)
from pu4spark_spark.operators.text import q_text_lang_id, q_text_quality

SF = "/root/testdata/sf0.001"


def test_quality_score_bounds(spark):
    rows = q_text_quality(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["quality_score"] <= 1.0
        assert 0.0 <= r["stop_ratio"] <= 1.0


def test_lang_id_deterministic(spark):
    a = {r["doc_id"]: r["pred_lang"] for r in q_text_lang_id(spark, SF).collect()}
    b = {r["doc_id"]: r["pred_lang"] for r in q_text_lang_id(spark, SF).collect()}
    assert a == b
    assert set(a.values()) <= {"en", "es", "de", "fr", "zh"}


def test_multimodal_pack_and_decode(spark):
    docs = spark.createDataFrame(
        [(1, "hello world", "s1"), (2, "abc", "s2")],
        ["doc_id", "text", "source"],
    )
    packed = pack_documents(docs)
    assert [f.name for f in packed.schema.fields] == ["doc_id", "payload", "meta"]
    assert packed.schema["payload"].dataType.typeName() == "binary"
    feats = {r["doc_id"]: r for r in extract_features(packed).collect()}
    n, head, frames = fake_features(b"hello world")
    assert feats[1]["n_bytes"] == n == 11
    assert feats[1]["head_sum"] == head
    assert feats[1]["n_frames"] == frames


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_streaming_matches_batch(spark):
    from pu4spark_spark.operators.relational import q_events_hourly
    from pu4spark_spark.streaming.events import run_hourly_counts_available_now

    stream_rows = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in run_hourly_counts_available_now(spark, SF).collect()
    }
    batch_rows = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in q_events_hourly(spark, SF).collect()
    }
    assert stream_rows == batch_rows


def test_registry_consistency():
    import __spark_entry__ as m

    qs, oracles = m.queries(), m.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
    # every callable is invocable as (spark, sf_dir): exactly two
    # REQUIRED parameters (extras like plan-gate knobs must default)
    import inspect

    for fn in qs.values():
        params = inspect.signature(fn).parameters.values()
        required = [
            p for p in params
            if p.default is inspect.Parameter.empty
            and p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        ]
        assert len(required) == 2, fn


def test_decode_image_stub_branch_without_pillow():
    """Without Pillow the real decode path must refuse loudly (the
    Arrow pipeline then runs on fake_features), not half-work."""
    import builtins
    import sys

    import pytest

    from pu4spark_spark.operators.multimodal import decode_image

    assert "PIL" not in sys.modules or sys.modules["PIL"] is not None
    if "PIL" in sys.modules and not isinstance(
        sys.modules["PIL"], Exception
    ):
        try:
            import PIL  # noqa: F401

            pytest.skip("Pillow unexpectedly present")
        except ImportError:
            pass
    with pytest.raises(NotImplementedError):
        decode_image(b"not-an-image")


def test_decode_image_real_branch_via_fake_pillow(monkeypatch):
    """With an importable PIL, decode_image runs the real branch:
    inject a minimal fake Pillow and check (width, height, mean_luma)."""
    import sys
    import types

    import numpy as np

    from pu4spark_spark.operators.multimodal import decode_image

    class _FakeImg:
        width, height = 2, 2

        def convert(self, mode):
            assert mode == "L"
            return self

        def __array__(self, dtype=None, copy=None):
            return np.array([[0, 255], [255, 0]], dtype="float64")

    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")
    pil_image.open = lambda fh: _FakeImg()
    pil.Image = pil_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)

    assert decode_image(b"\x89PNG...") == (2, 2, 127.5)


def test_bpe_pair_counts_vs_python(spark):
    """Three-engine check: the BPE pair statistics must equal a plain
    CPython Counter over the same corpus."""
    from collections import Counter

    from pu4spark_spark.operators.text import q_text_bpe_pair_counts

    sf = "/root/testdata/sf0.001"
    texts = [
        r.text
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("text")
        .collect()
    ]
    wc = Counter(
        w for t in texts for w in t.split(" ") if len(w) >= 2
    )
    n_words: Counter = Counter()
    total: Counter = Counter()
    for w, c in wc.items():
        for i in range(len(w) - 1):
            pair = w[i : i + 2]
            n_words[pair] += 1
            total[pair] += c
    got = {
        r.pair: (r.n_positions, r.total_freq)
        for r in q_text_bpe_pair_counts(spark, sf).collect()
    }
    assert got == {p: (n_words[p], total[p]) for p in n_words}


# -- content-defined chunking ---------------------------------------------

def _reference_cdc(payload: bytes):
    """Independent re-implementation of the gear-hash chunker (same
    published algorithm, written from the definition)."""
    import hashlib

    gear = [
        int(hashlib.md5(f"gear:{i}".encode()).hexdigest()[:16], 16)
        for i in range(256)
    ]
    out, start, h = [], 0, 0
    for i, b in enumerate(payload):
        h = ((h * 2) % 2**64 + gear[b]) % 2**64
        if (i + 1 - start >= 16 and h % 64 == 0) or i + 1 - start >= 256:
            out.append((start, i + 1 - start))
            start = i + 1
    if start < len(payload):
        out.append((start, len(payload) - start))
    return out


def test_cdc_chunks_match_reference_and_tile(spark):
    import hashlib

    from pu4spark_spark.operators.multimodal import q_mm_cdc_chunks

    sf = "/root/testdata/sf0.001"
    rows = q_mm_cdc_chunks(spark, sf).collect()
    docs = {
        r["doc_id"]: r["text"].encode("utf-8")
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, payload in docs.items():
        got = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        ref = _reference_cdc(payload)
        assert [(r["offset"], r["length"]) for r in got] == ref
        # chunks tile the payload exactly, bounds hold for all but last
        pos = 0
        for r in got[:-1]:
            assert r["offset"] == pos and 16 <= r["length"] <= 256
            pos += r["length"]
        assert got[-1]["offset"] + got[-1]["length"] == len(payload)
        # hashes are of the actual chunk bytes
        r0 = got[0]
        assert (
            hashlib.md5(payload[: r0["length"]]).hexdigest() == r0["chunk_md5"]
        )


def test_cdc_shift_invariance():
    """The CDC motivation: prepending bytes must leave the chunk-hash
    multiset mostly intact (only chunks up to the first re-synced
    boundary change) — fixed-stride chunking would shift every chunk."""
    import hashlib

    from pu4spark_spark.operators.multimodal import cdc_boundaries

    # deterministic high-entropy payload: a short-period text can have
    # so few distinct 64-byte contexts that NO position satisfies the
    # cut mask and every cut is a max-length force-cut (observed with a
    # 45-byte-period sentence) — content-defined cuts need content
    base = b"".join(
        hashlib.md5(f"blk:{i}".encode()).digest() for i in range(120)
    )
    shifted = b"INSERTED-PREFIX-BYTES!" + base

    def hashes(p: bytes) -> list[str]:
        return [
            hashlib.md5(p[o : o + ln]).hexdigest()
            for o, ln in cdc_boundaries(p)
        ]

    hb, hs = hashes(base), hashes(shifted)
    shared = len(set(hb) & set(hs))
    assert shared >= int(0.7 * len(hb)), (shared, len(hb), len(hs))


def test_cdc_dup_chunks_counts(spark):
    """Two docs sharing a long run of identical bytes must surface
    duplicate chunks with correct copy counts."""
    from pu4spark_spark.operators.multimodal import cdc_chunk_table

    import hashlib

    common = b"".join(
        hashlib.md5(f"shared:{i}".encode()).digest() for i in range(60)
    )
    df = spark.createDataFrame(
        [
            (1, bytearray(b"unique-head-one " + common)),
            (2, bytearray(b"a-different-head " + common)),
        ],
        "doc_id long, payload binary",
    )
    chunks = cdc_chunk_table(df).collect()
    from collections import Counter

    copies = Counter(r["chunk_md5"] for r in chunks)
    assert max(copies.values()) == 2  # interior common chunks collide
    n_dup = sum(1 for v in copies.values() if v == 2)
    assert n_dup >= 3

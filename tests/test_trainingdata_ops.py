"""Ground-truth tests for the hash-family training-data operators (the ones
without SQL oracles): MinHash/SimHash near-dup detection quality, LSH ANN
recall vs the exact baseline, multimodal batch plumbing."""

import itertools

import pytest
from pyspark.sql import functions as F

from bbt_etl_dw_spark.operators.dedup import (
    cosine_near_dups,
    exact_dedup,
    jaccard_verify,
    minhash_candidates,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from bbt_etl_dw_spark.operators.multimodal import decode_media, media_stats, sample_frames
from bbt_etl_dw_spark.operators.similarity import brute_force_topk, lsh_topk

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm mat near the old wooden door of the small house"
)


@pytest.fixture(scope="module")
def docs(spark):
    # 0/1: near-dups (one word changed); 2: exact dup of 0; 3/4: unrelated
    rows = [
        (0, BASE),
        (1, BASE.replace("lazy", "sleepy")),
        (2, BASE),
        (3, "completely different content about spark query engines and shuffles "
            "partitions executors and adaptive plans running at large scale"),
        (4, "yet another unrelated document mentioning benchmarks results and "
            "numbers with no overlap whatsoever in its shingle set at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _python_jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(t):
        ws = t.lower().split()
        return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(spark, docs):
    kept = exact_dedup(docs, "doc_id", "text")
    ids = {r["doc_id"] for r in kept.collect()}
    assert 2 not in ids  # exact dup of 0 dropped
    assert {0, 1, 3, 4} <= ids


def test_minhash_pipeline_matches_bruteforce(spark, docs):
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    truth = {
        (a, b)
        for a, b in itertools.combinations(sorted(rows), 2)
        if _python_jaccard(rows[a], rows[b]) >= 0.5
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    # exact-verify stage: no false positives; LSH: catches these high-j pairs
    assert got == truth
    assert (0, 2) in got and (0, 1) in got

    # verified jaccard values equal the python ground truth
    verified = jaccard_verify(
        docs, minhash_candidates(docs, "doc_id", "text"), "doc_id", "text"
    ).collect()
    for r in verified:
        assert r["jaccard"] == pytest.approx(
            _python_jaccard(rows[r["id_a"]], rows[r["id_b"]])
        )


def test_ngram_jaccard_exact_allpairs(spark, docs):
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    truth = {
        (a, b): _python_jaccard(rows[a], rows[b])
        for a, b in itertools.combinations(sorted(rows), 2)
        if _python_jaccard(rows[a], rows[b]) >= 0.5
    }
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert set(got) == set(truth)
    for pair, j in got.items():
        assert j == pytest.approx(truth[pair])

    # df-capped variant only ever drops pairs, never invents them
    capped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5, max_shingle_df=2
        ).collect()
    }
    assert capped <= set(got)


def test_simhash_near_dups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dups(docs, "doc_id", "text", max_hamming=10).collect()
    }
    assert pairs.get((0, 2)) == 0  # identical text -> identical simhash
    assert (0, 1) in pairs  # one-word edit -> small hamming distance
    assert (3, 4) not in pairs  # unrelated docs


def test_lsh_ann_recall(spark, sf_dir):
    from bbt_etl_dw_spark.catalog import table

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=10)
    approx = lsh_topk(emb, queries, k=10, planes=4)  # 16 buckets -> high recall
    e = {(r["query_id"], r["corpus_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["corpus_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.3, f"LSH recall {recall} suspiciously low"
    # the query vector itself must always be its own nearest neighbor
    for q in range(5):
        assert (q, q) in a


def test_ivf_ann_recall(spark, sf_dir):
    from bbt_etl_dw_spark.catalog import table
    from bbt_etl_dw_spark.operators.similarity import ivf_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=10)
    approx = ivf_topk(emb, queries, k=10, nlist=16, nprobe=4)
    e = {(r["query_id"], r["corpus_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["corpus_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall {recall} suspiciously low"
    # probing the query's own list must always find the query itself
    for q in range(5):
        assert (q, q) in a
    # determinism: identical result on a rerun (exact-decimal centroids)
    a2 = {(r["query_id"], r["corpus_id"]) for r in
          ivf_topk(emb, queries, k=10, nlist=16, nprobe=4).collect()}
    assert a == a2


def test_cosine_near_dups_self_similarity(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.001, 0.0, 0.0]),  # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),  # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r["id_a"], r["id_b"]) for r in cosine_near_dups(df, "vec_id", "embedding").collect()}
    assert (0, 1) in pairs and (0, 2) not in pairs


def test_cosine_near_dup_recall(spark, sf_dir):
    from bbt_etl_dw_spark.catalog import table
    from bbt_etl_dw_spark.operators.similarity import exact_cosine_pairs

    emb = table(spark, sf_dir, "embeddings")
    # Non-vacuous threshold for this corpus (max off-diagonal cosine ~0.52);
    # shallow-and-wide family (4 planes x 16 tables) because p(0.45)≈0.65.
    truth = {
        (r["id_a"], r["id_b"])
        for r in exact_cosine_pairs(emb, "vec_id", "embedding", 0.45).collect()
    }
    assert truth, "0.45 threshold vacuous on this corpus — test proves nothing"
    # tables=32 here (suite uses 16): at this tiny sf the truth set is ~7
    # pairs, so a single unlucky borderline pair (per-pair miss ≈ 4% at 16
    # tables) swings measured recall by 14 points. 32 tables pushes the
    # per-pair miss to ~0.2%, making the >=0.9 bound a test of the
    # ALGORITHM, not of one pair's luck. (The suite query's 16-table run
    # needs no recall margin at all — its full-pipeline oracle replays the
    # bucketing exactly, so the driver checks whatever LSH emits.)
    got = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dups(
            emb, "vec_id", "embedding", threshold=0.45, planes=4, tables=32
        ).collect()
    }
    assert got <= truth  # exact verify stage -> no false positives
    recall = len(got) / len(truth)
    assert recall >= 0.9, f"cosine LSH recall {recall} below target"


def test_exact_cosine_pairs_matches_numpy(spark, sf_dir):
    import numpy as np

    from bbt_etl_dw_spark.catalog import table
    from bbt_etl_dw_spark.operators.similarity import exact_cosine_pairs

    emb = table(spark, sf_dir, "embeddings")
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in exact_cosine_pairs(emb, "vec_id", "embedding", 0.4).collect()
    }
    truth = {}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            c = float(vecs[a] @ vecs[b] / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])))
            if c >= 0.4:
                truth[(a, b)] = c
    assert set(got) == set(truth)
    for pair, c in got.items():
        assert c == pytest.approx(truth[pair], abs=1e-12)


def test_multimodal_decode_plumbing(spark):
    rows = [
        (1, "image", bytearray(b"\x89PNG fake bytes"), "image/png", "s3://x/1.png"),
        (2, "image", bytearray(b"other bytes"), "image/png", "s3://x/2.png"),
        (3, "audio", None, "audio/wav", "s3://x/3.wav"),
    ]
    from bbt_etl_dw_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    decoded = decode_media(df, fake=True, batch_size=2)
    got = {r["media_id"]: r for r in decoded.collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["n_bytes"] == 15 and len(got[1]["feature"]) == 8
    assert 64 <= got[1]["width"] <= 255
    # determinism: same payload -> same fake decode
    again = {r["media_id"]: r for r in decode_media(df, fake=True).collect()}
    assert again[1]["feature"] == got[1]["feature"]
    # without Pillow the real-codec path is an explicit boundary, not a stub
    from bbt_etl_dw_spark.operators import multimodal as _mm

    if not _mm._HAS_CODECS:
        with pytest.raises(NotImplementedError):
            decode_media(df, fake=False)

    stats = {r["kind"]: r for r in media_stats(df).collect()}
    assert stats["image"]["n_items"] == 2


def _minimal_png(width: int, height: int, rgb=(255, 0, 0)) -> bytes:
    """A complete, valid RGB PNG built with the stdlib only (zlib CRC +
    deflate): signature, IHDR, one IDAT of filter-0 scanlines, IEND."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + bytes(rgb) * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_multimodal_header_decode_dimensions(spark):
    """Stdlib header parsing reports TRUE dimensions from real container
    bytes (PNG IHDR / GIF screen descriptor / JPEG SOF) with no codec
    library — the standing evidence for the dimensions-only contract in
    Pillow-less environments. Unparseable payloads and audio rows pass
    through metadata-only."""
    from bbt_etl_dw_spark.operators import multimodal as _mm

    import struct

    gif = b"GIF89a" + struct.pack("<HH", 7, 9) + b"\x00" * 10
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"     # APP0
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"        # SOF0
        + struct.pack(">HH", 5, 3)                             # height=5 width=3
        + b"\x03\x00\x00\x00"
    )
    rows = [
        (1, "image", bytearray(_minimal_png(6, 4)), "image/png", "mem://p.png"),
        (2, "image", bytearray(gif), "image/gif", "mem://g.gif"),
        (3, "image", bytearray(jpeg), "image/jpeg", "mem://j.jpg"),
        (4, "image", bytearray(b"not an image"), "image/png", "mem://bad"),
        (5, "audio", bytearray(b"riff"), "audio/wav", "mem://a.wav"),
    ]
    df = spark.createDataFrame(rows, _mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_media(df, headers_only=True).collect()}
    assert (got[1]["width"], got[1]["height"]) == (6, 4)
    assert (got[2]["width"], got[2]["height"]) == (7, 9)
    assert (got[3]["width"], got[3]["height"]) == (3, 5)
    assert got[4]["width"] is None and got[4]["n_bytes"] == 12
    assert got[5]["width"] is None and got[5]["feature"] == []


def test_multimodal_real_decode_roundtrip(spark):
    """When Pillow is present, the real decode path reports true image
    dimensions and a 2x2-thumbnail RGB feature; audio rows pass through
    metadata-only. Where Pillow is absent, the same contract is exercised
    through the stdlib header parser on the same PNG bytes (dims true,
    feature empty) — no skip either way."""
    from bbt_etl_dw_spark.operators import multimodal as _mm

    if not _mm._HAS_CODECS:
        png = _minimal_png(2, 2)
        rows = [
            (1, "image", bytearray(png), "image/png", "mem://red.png"),
            (2, "audio", bytearray(b"riff"), "audio/wav", "mem://a.wav"),
        ]
        df = spark.createDataFrame(rows, _mm.MEDIA_SCHEMA)
        got = {
            r["media_id"]: r
            for r in decode_media(df, headers_only=True).collect()
        }
        assert (got[1]["width"], got[1]["height"]) == (2, 2)
        assert got[1]["feature"] == []  # pixel features need the codec
        assert got[2]["width"] is None and got[2]["feature"] == []
        return
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (2, 2), (255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()
    rows = [
        (1, "image", bytearray(png), "image/png", "mem://red.png"),
        (2, "audio", bytearray(b"riff"), "audio/wav", "mem://a.wav"),
    ]
    df = spark.createDataFrame(rows, _mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_media(df, fake=False).collect()}
    assert (got[1]["width"], got[1]["height"]) == (2, 2)
    assert len(got[1]["feature"]) == 12
    assert got[1]["feature"][0] == pytest.approx(1.0)  # red channel
    assert got[2]["width"] is None and got[2]["feature"] == []


def test_sample_frames(spark):
    df = spark.createDataFrame([(1, 25)], "video_id long, n_frames int")
    idx = [r["frame_index"] for r in sample_frames(df, every_n=10).collect()]
    assert idx == [0, 10, 20]


def test_cardinality_sketch_error_bound(spark, sf_dir):
    # r13: the query now emits the bound CHECK itself (within_bound) at
    # per-status grains PLUS the rollup 'ALL' grain; exact counts are
    # oracle-pinned by the driver. Here: every grain within bound, the
    # rollup row present exactly once, and statuses mutually exclusive.
    from bbt_etl_dw_spark.suite import load_all

    rows = load_all()["customer_cardinality_sketch"].builder(spark, sf_dir).collect()
    assert rows
    by_status = {r["o_orderstatus"]: r for r in rows}
    assert len(by_status) == len(rows)  # one row per grain
    assert "ALL" in by_status
    for r in rows:
        assert r["within_bound"] is True, r["o_orderstatus"]
        assert r["exact_customers"] > 0
    # the global grain is a distinct-union, not a sum (customers span
    # statuses), so it's bounded by the per-status total
    per_status_sum = sum(
        r["exact_customers"] for r in rows if r["o_orderstatus"] != "ALL"
    )
    assert by_status["ALL"]["exact_customers"] <= per_status_sum


def test_word_ngrams_and_repetition(spark):
    from bbt_etl_dw_spark.operators.textstats import repetition_features, word_ngrams

    df = spark.createDataFrame(
        [(0, "a b a b a"), (1, "x y"), (2, "solo"), (3, "")],
        "doc_id long, text string",
    )
    grams = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", word_ngrams("text", 2).alias("g")).collect()
    }
    assert grams[0] == ["a b", "b a", "a b", "b a"]  # duplicates preserved
    assert grams[1] == ["x y"]
    assert grams[2] == [] and grams[3] == []

    f_ = repetition_features("text", n=2)
    rep = {
        r["doc_id"]: (r["t"], r["d"], r["frac"])
        for r in df.select(
            "doc_id",
            f_["n_grams"].alias("t"),
            f_["n_distinct_grams"].alias("d"),
            f_["dup_fraction"].alias("frac"),
        ).collect()
    }
    assert rep[0] == (4, 2, 0.5)
    assert rep[1] == (1, 1, 0.0)
    assert rep[2] == (0, 0, 0.0)  # no div-by-zero on short docs


def test_r07_batch9_guards(spark):
    """Review batch 9 regression pins: semantic_dedup forwards column
    names; decontaminate's hit-set broadcast is guarded (and the
    shuffled path gives identical results); random_projection/jl_project
    raise on ragged vectors instead of emitting all-NULL rows;
    assign_split thresholds are PERCENTAGES at any n_buckets;
    negative_samples rejects k<1 (sequence(0,-1) phantom draws);
    quality avg_word_len uses normalized separators."""
    import pytest as _pytest

    from bbt_etl_dw_spark.operators.decontam import decontaminate
    from bbt_etl_dw_spark.operators.projection import jl_project
    from bbt_etl_dw_spark.operators.similarity import (
        negative_samples,
        random_projection,
        semantic_dedup,
    )
    from bbt_etl_dw_spark.operators.textstats import (
        assign_split,
        quality_features,
    )

    # semantic_dedup with non-default column names (was: AnalysisException)
    vecs = spark.createDataFrame(
        [(i, [float(i), float(i % 3)]) for i in range(12)],
        "my_id long, emb array<double>",
    )
    out = semantic_dedup(vecs, id_col="my_id", vec_col="emb", nlist=2, iters=1)
    assert out.count() == 12

    # decontaminate: broadcast_hits=False equals the guarded default
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "zeta eta theta iota")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(9, "alpha beta gamma delta")],
                               "doc_id long, text string")
    a = sorted(r.doc_id for r in decontaminate(docs, ev).collect())
    b = sorted(r.doc_id for r in
               decontaminate(docs, ev, broadcast_hits=False).collect())
    assert a == b == [2]

    # ragged vectors raise in-plan; NULL vectors pass through
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(Exception, match="expected 2-dim"):
        random_projection(ragged, out_dims=4, dims=2).collect()
    with _pytest.raises(Exception, match="expected 2-dim"):
        jl_project(ragged, "embedding", in_dim=2, k=4).collect()
    ok2 = ragged.filter("vec_id != 2")
    assert random_projection(ok2, out_dims=4, dims=2).count() == 2
    assert jl_project(ok2, "embedding", in_dim=2, k=4).count() == 2

    # assign_split: percentage semantics at n_buckets=1000
    ids = spark.range(3000).select(F.col("id").cast("string").alias("sid"))
    frac = (
        ids.select(assign_split("sid", n_buckets=1000).alias("s"))
        .filter(F.col("s") == "train").count()
    ) / 3000.0
    assert 0.75 < frac < 0.85, frac
    with _pytest.raises(ValueError, match="multiple of"):
        assign_split("sid", n_buckets=64)

    with _pytest.raises(ValueError, match="k=0"):
        negative_samples(vecs, k=0, id_col="my_id")

    # whitespace-heavy doc: avg word length over normalized separators
    wdoc = spark.createDataFrame([("a\n\n\n  b",)], "text string")
    feats = quality_features("text")
    r = wdoc.select(feats["avg_word_len"].alias("awl")).collect()[0]
    assert r.awl == 1.0  # was (7-1)/2 = 3.0 on the raw length


def test_decontaminate_drops_overlapping_docs(spark):
    from bbt_etl_dw_spark.operators.decontam import contamination_hits, decontaminate

    train = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),    # contains eval 4-gram
            (1, "one two three four five six"),       # clean
            (2, "zz alpha beta gamma delta"),         # contains eval 4-gram
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta UNRELATED tail words here")],
        "doc_id long, text string",
    )
    hits = {
        r["doc_id"]: r["n_eval_grams_hit"]
        for r in contamination_hits(train, eval_df, n=4).collect()
    }
    assert hits == {0: 1, 2: 1}

    kept = sorted(r["doc_id"] for r in decontaminate(train, eval_df, n=4).collect())
    assert kept == [1]

    # plan gate: the eval n-gram set must be broadcast, never shuffled
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        contamination_hits(train, eval_df, n=4).explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


def test_corpus_vocabulary_determinism(spark):
    from bbt_etl_dw_spark.operators.textstats import corpus_vocabulary

    df = spark.createDataFrame(
        [(0, "a a b c"), (1, "a b b"), (2, "c")],
        "doc_id long, text string",
    )
    rows = [tuple(r) for r in corpus_vocabulary(df, top_k=2).collect()]
    # doc_freq ties (a,b,c all appear; a/b in 2 docs) break by total then word
    assert rows == [("a", 2, 3), ("b", 2, 3)]


def test_dedup_clusters_chain_and_clique(spark):
    from bbt_etl_dw_spark.operators.dedup import dedup_clusters

    # chain 1-2-3-4 (diameter 3: needs real propagation, not one hop),
    # clique {10,11,12}, isolated pair {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {(r.doc_id, r.cluster_id) for r in dedup_clusters(pairs).collect()}
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_collapsed_jaccard_edges_component_equivalent(spark):
    """collapsed_jaccard_edges (exact-dup pre-collapse, r07 scale fix for
    doc_dedup_clusters) must yield BIT-IDENTICAL clusters to clustering
    the full ngram_jaccard_pairs output — including the tricky corners:
    member-to-outside near-dups bridged via the representative, empty
    texts (identical '' fingerprints DO pair, jaccard 1), NULL texts
    (NULL shingles never pair — exempt from collapse), whitespace/case
    variants (same normalized form => same group), and singletons."""
    from bbt_etl_dw_spark.operators.dedup import (
        collapsed_jaccard_edges,
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon"),   # exact group {1,5,9}
        (5, "alpha beta gamma delta epsilon"),
        (9, "  ALPHA   beta GAMMA delta epsilon "),  # same normalized form
        (2, "one two three four five"),           # exact group {2,7}
        (7, "one two three four five"),
        (3, "one two three four six"),            # near-dup of 2/7 (j=0.5)
        (4, "totally unrelated text content here"),  # singleton: no output
        (8, ""),                                  # empty pair {8,10}
        (10, ""),
        (11, None),                               # NULL text: never pairs
        (12, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    full = sorted(
        (r.doc_id, r.cluster_id)
        for r in dedup_clusters(ngram_jaccard_pairs(df, "doc_id", "text")).collect()
    )
    fast = sorted(
        (r.doc_id, r.cluster_id)
        for r in dedup_clusters(collapsed_jaccard_edges(df, "doc_id", "text")).collect()
    )
    assert fast == full
    assert fast == [
        (1, 1), (2, 2), (3, 2), (5, 1), (7, 2), (8, 8), (9, 1), (10, 8)
    ]


def test_incremental_dedup_semantics(spark):
    from bbt_etl_dw_spark.operators.dedup import incremental_exact_dedup

    hist = spark.createDataFrame(
        [(0, "seen before"), (2, "also seen")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (11, "seen before"),   # dup of history -> dropped
            (13, "brand new"),     # survives
            (15, "twice in batch"),  # min-id rep -> survives
            (17, "twice in batch"),  # in-batch dup -> dropped
        ],
        "doc_id long, text string",
    )
    got = sorted(
        r.doc_id for r in incremental_exact_dedup(hist, batch, "doc_id", "text").collect()
    )
    assert got == [13, 15]


def test_ivf_partitioned_layout_prunes_probed_lists(spark, sf_dir, tmp_path):
    """The 100TB IVF layout claim made real: corpus written PARTITIONED BY
    inverted-list id; a probe reads only its nprobe lists — the cid filter
    must reach the scan as a PartitionFilter (pruned before any IO) and
    the probed read must equal the corresponding in-memory lists."""
    import contextlib
    import io

    from bbt_etl_dw_spark.catalog import table
    from bbt_etl_dw_spark.operators.similarity import assign_centroid, ivf_centroids

    emb = table(spark, sf_dir, "embeddings", spread=True)
    cents = ivf_centroids(emb, nlist=8, iters=1)
    v = F.col("embedding").cast("array<double>")
    listed = emb.select("vec_id", "embedding", assign_centroid(v, cents).alias("cid"))
    out = str(tmp_path / "ivf_corpus")
    listed.write.partitionBy("cid").mode("overwrite").parquet(out)

    probed = spark.read.parquet(out).filter(F.col("cid").isin([0, 3]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probed.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "cid" in plan.split("PartitionFilters", 1)[1].splitlines()[0]

    want = {r.vec_id for r in listed.filter(F.col("cid").isin([0, 3])).collect()}
    got = {r.vec_id for r in probed.collect()}
    assert got == want and len(got) > 0


def test_dedup_clusters_raises_on_nonconvergence(spark):
    import pytest as _pytest

    from bbt_etl_dw_spark.operators.dedup import dedup_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(chain, max_iters=2, star_fallback=False)
    # and converges fine when the budget covers the diameter
    got = dedup_clusters(chain, max_iters=40)
    assert got.filter(F.col("cluster_id") != 0).count() == 0


def test_dedup_clusters_star_fallback_on_high_diameter_chain(spark):
    """A chain longer than the propagation budget must still resolve (via
    the alternating large-star/small-star fallback), not fail the run —
    and resolve CORRECTLY: every node labeled with the component min."""
    from bbt_etl_dw_spark.operators.dedup import dedup_clusters

    # chain 0-1-...-30 (diameter 30 >> max_iters=3) plus a separate clique
    # and an isolated pair, so the fallback must keep components apart
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)]
        + [(100, 101), (100, 102), (101, 102), (200, 201)],
        "id_a long, id_b long",
    )
    got = {
        (r.doc_id, r.cluster_id)
        for r in dedup_clusters(pairs, max_iters=3).collect()
    }
    want = {(i, 0) for i in range(31)} | {
        (100, 100), (101, 100), (102, 100), (200, 200), (201, 200),
    }
    assert got == want


def test_star_components_matches_propagation_on_random_graph(spark):
    """The fallback algorithm must agree with min-label propagation on a
    graph where both converge (random sparse graph, seeded)."""
    import random

    from bbt_etl_dw_spark.operators.dedup import _star_components, dedup_clusters

    rng = random.Random(7)
    raw = {(rng.randrange(80), rng.randrange(80)) for _ in range(90)}
    raw = [(a, b) for a, b in raw if a != b]
    pairs = spark.createDataFrame(raw, "id_a long, id_b long")
    via_prop = {
        (r.doc_id, r.cluster_id)
        for r in dedup_clusters(pairs, max_iters=40, star_fallback=False).collect()
    }
    e = pairs.selectExpr("id_a as src", "id_b as dst")
    edges = (
        e.unionByName(e.selectExpr("dst as src", "src as dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    via_star = {
        (r.doc_id, r.cluster_id) for r in _star_components(edges).collect()
    }
    assert via_star == via_prop and len(via_star) > 0


def test_incremental_minhash_semantics(spark):
    """Batch-vs-corpus near-dup: a batch doc near-dupping an indexed doc is
    caught (and dropped by the dedup wrapper), in-batch near-dups keep the
    min-id representative, clean docs survive."""
    from bbt_etl_dw_spark.operators.dedup import (
        incremental_minhash_dedup,
        incremental_minhash_pairs,
        minhash_corpus_index,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    hist = spark.createDataFrame(
        [(0, base), (2, "completely unrelated history text about spark engines")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (11, base),  # near-dups history doc 0 -> dropped
            (13, "fresh new content with no duplicate partner at all"),
            (15, "shared batch text that repeats word for word exactly"),
            (17, "shared batch text that repeats word for word exactly"),
        ],
        "doc_id long, text string",
    )
    idx = minhash_corpus_index(hist, "doc_id", "text")
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in incremental_minhash_pairs(idx, batch, "doc_id", "text").collect()
    }
    assert (0, 11) in pairs and pairs[(0, 11)] == 1.0
    assert (15, 17) in pairs and pairs[(15, 17)] == 1.0
    # no history-history pairs ever emitted
    assert all(a % 2 == 1 or b % 2 == 1 for a, b in pairs)

    survivors = sorted(
        r.doc_id for r in incremental_minhash_dedup(idx, batch, "doc_id", "text").collect()
    )
    assert survivors == [13, 15]


def test_incremental_minhash_never_rereads_corpus_text(spark, tmp_path):
    """The O(batch) property, asserted on the actual plan: probing a
    PERSISTED index must not scan the corpus documents file — only the
    index parquet and the batch appear as scan relations."""
    from bbt_etl_dw_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_corpus_index,
    )

    corpus_path = str(tmp_path / "corpus_docs")
    index_path = str(tmp_path / "corpus_index")
    batch_path = str(tmp_path / "batch_docs")
    spark.createDataFrame(
        [(i * 2, f"history document number {i} with some shared words") for i in range(50)],
        "doc_id long, text string",
    ).write.parquet(corpus_path)
    minhash_corpus_index(
        spark.read.parquet(corpus_path), "doc_id", "text"
    ).write.parquet(index_path)
    spark.createDataFrame(
        [(1, "history document number 7 with some shared words"), (3, "novel text")],
        "doc_id long, text string",
    ).write.parquet(batch_path)

    # materialize_index=False keeps one lazy plan so inputFiles() can see
    # the scan relations (the default checkpoints the combined index,
    # which reads an RDD and reports no input files — r14)
    out = incremental_minhash_pairs(
        spark.read.parquet(index_path),
        spark.read.parquet(batch_path),
        "doc_id",
        "text",
        materialize_index=False,
    )
    scanned = out.inputFiles()
    assert any("corpus_index" in f for f in scanned)
    assert any("batch_docs" in f for f in scanned)
    assert not any(
        "corpus_docs" in f for f in scanned
    ), "corpus text file appears in the probe plan"
    # and the probe actually finds the cross-boundary near-dup
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert (1, 14) in got  # batch doc 1 ~ history doc 14 ("number 7")
    # the DEFAULT (checkpointed-index) mode must return exactly the same
    # pairs — pins the two modes' equivalence so the lazy-mode plan
    # assertions above keep covering the production default (r14 review)
    out_default = incremental_minhash_pairs(
        spark.read.parquet(index_path),
        spark.read.parquet(batch_path),
        "doc_id",
        "text",
    )
    got_default = {(r.id_a, r.id_b) for r in out_default.collect()}
    assert got_default == got


def test_dedup_clusters_reliable_checkpoint(spark, tmp_path):
    """reliable_checkpoint=True routes every round through checkpoint()
    into the session checkpoint dir (the executor-loss-safe cluster mode)
    and produces identical clusters, on both the propagation path and the
    star fallback path."""
    from bbt_etl_dw_spark.operators.dedup import dedup_clusters

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)] + [(100, 101)], "id_a long, id_b long"
    )
    want = {(i, 0) for i in range(13)} | {(100, 100), (101, 100)}
    got = {
        (r.doc_id, r.cluster_id)
        for r in dedup_clusters(pairs, reliable_checkpoint=True).collect()
    }
    assert got == want
    # star fallback under reliable checkpointing (diameter 12 > max_iters 2)
    got_star = {
        (r.doc_id, r.cluster_id)
        for r in dedup_clusters(pairs, max_iters=2, reliable_checkpoint=True).collect()
    }
    assert got_star == want
    import glob

    assert glob.glob(str(tmp_path / "ckpt" / "*")), "no checkpoint data written"


def test_duplicated_spans_semantics(spark):
    """Cross-doc shared runs become merged maximal spans; within-doc
    repetition alone never marks a window; short docs emit nothing."""
    from bbt_etl_dw_spark.operators.spans import duplicated_spans, span_dedup_stats

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 toks
    rows = [
        # doc 0 and 1 share the 10-token run at different offsets
        (0, "x1 x2 " + shared + " y1 y2"),
        (1, shared + " z1 z2 z3"),
        # doc 2: within-doc repetition only (8-token phrase twice) — no span
        (2, "p1 p2 p3 p4 p5 p6 p7 p8 q p1 p2 p3 p4 p5 p6 p7 p8"),
        # doc 3: too short for one window
        (3, "short doc"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicated_spans(docs, n=8).collect()
    }
    # 10 shared tokens => three 8-token windows starting at the run's
    # first 3 positions, merged into ONE maximal span covering the run.
    assert spans[0] == (2, 11, 10)
    assert spans[1] == (0, 9, 10)
    assert 2 not in spans and 3 not in spans

    stats = {r["doc_id"]: r for r in span_dedup_stats(docs, n=8).collect()}
    assert set(stats) == {0, 1, 2, 3}  # one row per input doc
    assert stats[0]["dup_tokens"] == 10 and stats[0]["n_spans"] == 1
    assert stats[1]["dup_fraction"] == 10 / 13
    assert stats[2]["dup_tokens"] == 0 and stats[3]["dup_tokens"] == 0


def test_duplicated_spans_disjoint_runs_stay_separate(spark):
    """Two shared runs separated by a unique gap > window width must come
    out as TWO spans, not merge across the gap."""
    from bbt_etl_dw_spark.operators.spans import duplicated_spans

    run_a = "a1 a2 a3 a4 a5 a6 a7 a8"
    run_b = "b1 b2 b3 b4 b5 b6 b7 b8"
    gap = "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"
    docs = spark.createDataFrame(
        [
            (0, f"{run_a} {gap} {run_b}"),
            (1, f"w1 {run_a} w2 w3"),
            (2, f"{run_b} v1 v2"),
        ],
        ["doc_id", "text"],
    )
    got = sorted(
        (r["span_start"], r["span_end"])
        for r in duplicated_spans(docs, n=8).filter(F.col("doc_id") == 0).collect()
    )
    assert got == [(0, 7), (18, 25)]


def test_redact_pii_patterns(spark):
    """Structured PII patterns scrub emails, IPs, SSNs, and phones while
    leaving ordinary words, version-like tokens, and short numbers alone."""
    from bbt_etl_dw_spark.functions.redact import mask_digit_runs, redact_pii

    rows = [
        (0, "contact bob.smith+test@corp.example.co for access"),
        (1, "server at 192.168.001.1 rebooted"),
        (2, "ssn 123-45-6789 on file"),
        (3, "call +1 (555) 123-4567 today"),
        (4, "plain text with v2 and 42 items"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    got = {
        r["id"]: r["clean"]
        for r in df.select("id", redact_pii("t").alias("clean")).collect()
    }
    assert got[0] == "contact [EMAIL] for access"
    assert got[1] == "server at [IP] rebooted"
    assert got[2] == "ssn [SSN] on file"
    assert got[3] == "call [PHONE] today"
    assert got[4] == "plain text with v2 and 42 items"  # untouched

    masked = df.filter(F.col("id") == 4).select(
        mask_digit_runs("t").alias("m")
    ).collect()[0]["m"]
    assert masked == "plain text with v# and # items"


def test_funnel_strict_ordering(spark):
    """A purchase BEFORE the user's first post-signup click must not count
    as funnel completion — the step-k event has to follow step k-1."""
    import datetime as dt

    from bbt_etl_dw_spark.suite import load_all

    base = dt.datetime(2024, 1, 1)

    def ev(i, u, typ, minutes):
        return (i, base + dt.timedelta(minutes=minutes), u, typ, 1.0, "{}")

    rows = [
        # user 1: signup -> click -> purchase in order (completes)
        ev(0, 1, "signup", 0), ev(1, 1, "click", 10), ev(2, 1, "purchase", 20),
        # user 2: purchase precedes the click (stops at click)
        ev(3, 2, "signup", 0), ev(4, 2, "purchase", 5), ev(5, 2, "click", 10),
        # user 3: click precedes signup, clicks never again (stops at signup)
        ev(6, 3, "click", 0), ev(7, 3, "signup", 5),
        # user 4: no signup at all (never enters)
        ev(8, 4, "click", 0), ev(9, 4, "purchase", 5),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import os
    import tempfile

    path = os.path.join(tempfile.mkdtemp(), "events.parquet")
    df.write.mode("overwrite").parquet(path)
    sf = os.path.dirname(path)
    got = {
        r["stage"]: r["n_users"]
        for r in load_all()["events_funnel"].builder(spark, sf).collect()
    }
    assert got == {"signup": 3, "click": 2, "purchase": 1}


def test_funnel_operator_arbitrary_depth(spark):
    """funnel_stage_counts is depth-generic: a 4-step funnel plans the
    same single user-key exchange and enforces strict ordering at every
    step."""
    import datetime as dt

    from bbt_etl_dw_spark.operators.behavior import funnel_stage_counts

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def ev(u, typ, minutes):
        nonlocal eid
        rows.append((eid, base + dt.timedelta(minutes=minutes), u, typ, 1.0, "{}"))
        eid += 1

    steps = ["a", "b", "c", "d"]
    # user 1 completes all four in order
    for i, s in enumerate(steps):
        ev(1, s, i * 10)
    # user 2 does a,b,c but d arrives BEFORE c -> stops at c
    ev(2, "a", 0); ev(2, "b", 10); ev(2, "d", 15); ev(2, "c", 20)
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = {r["stage"]: r["n_users"] for r in funnel_stage_counts(df, steps).collect()}
    assert got == {"a": 2, "b": 2, "c": 2, "d": 1}

    plan = funnel_stage_counts(df, steps)._jdf.queryExecution().executedPlan().toString()
    # depth-4 funnel: 4 Windows, still ONE user-key hash exchange (+ the
    # single-partition collapse for the 4-row stack output).
    assert plan.count("Window [") == 4
    assert plan.count("Exchange hashpartitioning") == 1


def test_bpe_train_matches_hand_bpe(spark):
    """The learned merge sequence reproduces classic hand-computed BPE on
    a toy corpus, including overlap semantics ('a a a' yields one merge,
    not two) and the deterministic lexicographic tie-break."""
    from bbt_etl_dw_spark.operators.bpe import apply_merges, bpe_train

    # freq: "ab" x3, "abc" x2, "aaa" x1
    docs = spark.createDataFrame(
        [(0, "ab ab ab abc abc aaa")], ["doc_id", "text"]
    )
    got = [
        (r["merge_rank"], r["lft"], r["rgt"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, k=3).orderBy("merge_rank").collect()
    ]
    # pairs round 1: (a,b)=5, (b,</w>)=3, (b,c)=2, (c,</w>)=2, (a,a)=2
    # [overlap: 'a a a </w>' counts (a,a) twice but merging is l-to-r]
    assert got[0] == (1, "a", "b", "ab", 5)
    # round 2: ab </w> x3 -> (ab,</w>)=3 beats (ab,c)=2, (a,a)=2...
    assert got[1] == (2, "ab", "</w>", "ab</w>", 3)
    # round 3: three-way tie at 2 — (a,a) [stats count BOTH overlapping
    # positions in 'a a a', classic get_stats], (ab,c), (c,</w>) — and
    # the lexicographic tie-break picks ("a","a").
    assert got[2] == (3, "a", "a", "aa", 2)

    toks = spark.createDataFrame([("abc",), ("aaa",)], ["w"]).select(
        apply_merges(
            __import__("pyspark.sql.functions", fromlist=["col"]).col("w"),
            [(l, r) for _, l, r, _, _ in got],
        ).alias("t")
    ).collect()
    # encode: 'abc' -> [ab, c, </w>]; 'aaa' -> the (a,a) merge applies
    # left-to-right non-overlapping -> [aa, a, </w>]
    assert [list(r["t"]) for r in toks] == [["ab", "c", "</w>"], ["aa", "a", "</w>"]]


def test_incremental_span_dedup_semantics(spark):
    """Batch spans come from corpus-index hits AND in-batch cross-doc
    sharing; corpus-only spans are not re-emitted; a batch doc matching
    the corpus gets the span even when unique within the batch."""
    from bbt_etl_dw_spark.operators.spans import (
        incremental_span_dedup,
        span_corpus_index,
    )

    shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9"  # 9 tokens -> 2 windows, 1 span
    corpus = spark.createDataFrame(
        [(0, shared + " tail0"), (1, "c b a " + "x1 x2 x3 x4 x5 x6 x7 x8")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (10, "lead " + shared),            # hits corpus index
            (11, "y1 y2 y3 y4 y5 y6 y7 y8 z"),  # shares with 12 (in-batch)
            (12, "y1 y2 y3 y4 y5 y6 y7 y8 q"),
            (13, "all alone unique text with no duplicate window at all ok"),
        ],
        ["doc_id", "text"],
    )
    idx = span_corpus_index(corpus, n=8)
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in incremental_span_dedup(idx, batch, n=8).collect()
    }
    assert got == {10: (1, 9), 11: (0, 7), 12: (0, 7)}


def test_incremental_span_dedup_never_reads_corpus_text(spark, tmp_path):
    """O(batch) probe shape: with the digest index persisted, the probe
    plan's input files include the index and the batch — never the corpus
    documents file."""
    from bbt_etl_dw_spark.operators.spans import (
        incremental_span_dedup,
        span_corpus_index,
    )

    corpus = spark.createDataFrame(
        [(0, "w1 w2 w3 w4 w5 w6 w7 w8 w9")], ["doc_id", "text"]
    )
    corpus_path, idx_path, batch_path = (
        str(tmp_path / p) for p in ("corpus", "idx", "batch")
    )
    corpus.write.parquet(corpus_path)
    span_corpus_index(spark.read.parquet(corpus_path), n=8).write.parquet(idx_path)
    spark.createDataFrame(
        [(10, "lead w1 w2 w3 w4 w5 w6 w7 w8 w9")], ["doc_id", "text"]
    ).write.parquet(batch_path)

    probe = incremental_span_dedup(
        spark.read.parquet(idx_path), spark.read.parquet(batch_path), n=8
    )
    files = probe.inputFiles()
    assert any("/idx/" in f or "idx" in f for f in files)
    assert not any("corpus" in f for f in files), files
    assert {r["doc_id"] for r in probe.collect()} == {10}


def test_null_and_blank_text_are_safe(spark):
    """NULL or blank text must not crash or fabricate output anywhere in
    the text family: spans/windows drop the doc, stats keep a zero row,
    BPE ignores it, fingerprints stay deterministic."""
    from bbt_etl_dw_spark.operators.bpe import bpe_train, word_frequencies
    from bbt_etl_dw_spark.operators.spans import duplicated_spans, span_dedup_stats

    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   "), (3, "real content here present")],
        "doc_id long, text string",
    )
    assert duplicated_spans(docs, n=2).count() == 0
    stats = {r["doc_id"]: r["dup_tokens"] for r in span_dedup_stats(docs, n=2).collect()}
    assert stats[3] == 0 and set(stats) == {0, 1, 2, 3}

    wf = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    assert "real" in wf and None not in wf
    merges = bpe_train(docs, k=1).collect()
    assert len(merges) == 1  # trains from the one real doc, no crash


def test_curation_pipeline_precedence_and_stages(spark):
    """Every drop reason fires, precedence holds (a doc that is BOTH an
    exact dup AND contaminated reports exact_dup), and kept docs carry a
    split while dropped docs carry none."""
    from bbt_etl_dw_spark.plans.curation import run_curation_pipeline

    good = ("the quick brown fox jumps over the lazy dog and runs into the "
            "field while the sun is high and the wind is calm today")
    eval_frag = "secret held out evaluation fragment nobody should train on"
    rows = [
        (0, good),
        (1, good),                      # exact dup of 0
        (2, "short junk"),              # low quality
        (3, good + " " + eval_frag),    # contaminated
        (4, good + " " + eval_frag),    # dup of 3 AND contaminated -> exact_dup
        (5, "the keeper document is clean long fluent and the words are "
            "plain and the content is entirely original and the text flows"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    eval_df = spark.createDataFrame([(100, eval_frag)], "doc_id long, text string")
    res = run_curation_pipeline(docs, eval_df, min_quality=0.7)
    d = {r["doc_id"]: (r["kept"], r["drop_reason"], r["split"])
         for r in res.disposition.collect()}
    assert d[0][0] and d[0][2] in ("train", "valid", "test")
    assert d[1] == (False, "exact_dup", None)
    assert d[2] == (False, "low_quality", None)
    assert d[3] == (False, "contaminated", None)
    assert d[4] == (False, "exact_dup", None)   # precedence over contaminated
    assert d[5][0]
    assert {r["doc_id"] for r in res.kept.collect()} == {0, 5}


def test_audio_window_features_pcm_ground_truth(spark):
    """Windowed PCM16 features against analytically known signals: a
    full-scale sine's RMS is amplitude/sqrt(2) with 2 crossings per
    cycle; silence has zero RMS and zero crossings; a short tail window
    reports its true sample count."""
    import math
    import struct

    from bbt_etl_dw_spark.operators.multimodal import audio_window_features

    sr = 8000
    freq = 100.0  # 100 Hz -> 12.8 cycles per 1024-sample window
    n = 1024 + 512  # one full window + a tail window
    amp = 0.5
    sine = b"".join(
        struct.pack("<h", int(amp * 32767 * math.sin(2 * math.pi * freq * i / sr)))
        for i in range(n)
    )
    silence = b"\x00\x00" * 1024
    rows = [
        (1, "audio", sine, "audio/pcm", None),
        (2, "audio", silence, "audio/pcm", None),
        (3, "image", b"\x01\x02", "image/png", None),  # filtered out
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, mime string, source_uri string"
    )
    out = {
        (r["media_id"], r["window_idx"]): r
        for r in audio_window_features(df, window_samples=1024).collect()
    }
    assert set(out) == {(1, 0), (1, 1), (2, 0)}

    full = out[(1, 0)]
    assert full["n_samples"] == 1024
    assert abs(full["rms"] - amp / math.sqrt(2)) < 0.01
    # 100 Hz at 8 kHz: 2 crossings/cycle * (1024/80) cycles = ~25.6
    assert 24 <= full["zero_crossings"] <= 27

    tail = out[(1, 1)]
    assert tail["n_samples"] == 512

    quiet = out[(2, 0)]
    assert quiet["rms"] == 0.0 and quiet["zero_crossings"] == 0


def test_chunk_documents_matches_reference(spark):
    """Sliding-window chunking vs a brute-force Python reference, plus the
    coverage laws: every token lands in some chunk, consecutive chunks
    overlap by exactly `overlap` tokens, and concatenating each chunk's
    non-overlapping tail reconstructs the document."""
    from bbt_etl_dw_spark.operators.textstats import chunk_documents

    chunk_tokens, overlap = 8, 3
    stride = chunk_tokens - overlap
    docs = {
        1: [f"t{i}" for i in range(25)],   # several chunks + partial tail
        2: [f"t{i}" for i in range(8)],    # exactly one chunk
        3: [f"t{i}" for i in range(9)],    # one full + tiny tail
        4: ["solo"],                       # shorter than a chunk
        5: [],                             # empty -> no chunks
    }

    def reference(tokens):
        if not tokens:
            return []
        out, s, i = [], 0, 0
        while True:
            piece = tokens[s : s + chunk_tokens]
            out.append((i, s, len(piece), " ".join(piece)))
            if s + chunk_tokens >= len(tokens):
                return out
            s += stride
            i += 1

    df = spark.createDataFrame(
        [(k, " ".join(v)) for k, v in docs.items()], "doc_id long, text string"
    )
    got = {}
    for r in chunk_documents(df, chunk_tokens=chunk_tokens, overlap=overlap).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start_token"], r["n_tokens"], r["chunk_text"])
        )
    for k, tokens in docs.items():
        assert sorted(got.get(k, [])) == reference(tokens), k

    # laws on the longest doc
    chunks = sorted(got[1])
    covered = set()
    for _, s, n, _ in chunks:
        covered |= set(range(s, s + n))
    assert covered == set(range(25))
    for (_, s0, n0, _), (_, s1, _, _) in zip(chunks, chunks[1:]):
        assert s0 + n0 - s1 == overlap  # exact overlap between neighbours
    rebuilt = chunks[0][3].split()
    for _, s, _, text in chunks[1:]:
        rebuilt += text.split()[overlap:]
    assert rebuilt == docs[1]


def test_weighted_sample_deterministic_and_monotone(spark):
    """Hash-based weighted sampling: reruns identical, append-stable (old
    decisions never flip), zero weight drops everything, weight 1 at
    rate 1 keeps everything, higher weight keeps a superset... of itself."""
    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.operators.textstats import weighted_sample

    docs = spark.createDataFrame(
        [(i, 0.3 if i % 2 else 0.9) for i in range(500)], "doc_id long, w double"
    )
    a = {r.doc_id for r in weighted_sample(docs, F.col("w")).collect()}
    b = {r.doc_id for r in weighted_sample(docs, F.col("w")).collect()}
    assert a == b  # deterministic
    # appending rows never flips earlier decisions
    more = docs.union(
        spark.createDataFrame([(i, 0.5) for i in range(500, 600)], "doc_id long, w double")
    )
    c = {r.doc_id for r in weighted_sample(more, F.col("w")).collect()}
    assert {d for d in c if d < 500} == a
    # weight monotonicity: keeping probability scales with weight
    lo = {r.doc_id for r in weighted_sample(docs, F.lit(0.2)).collect()}
    hi = {r.doc_id for r in weighted_sample(docs, F.lit(0.8)).collect()}
    assert lo <= hi and len(lo) < len(hi)
    assert weighted_sample(docs, F.lit(0.0)).count() == 0
    assert weighted_sample(docs, F.lit(1.0)).count() == 500
    # rough calibration: E[keep] = mean weight = 0.6 over 500 docs
    assert 0.45 < len(a) / 500 < 0.75


def test_token_mix_hits_target_shares(spark):
    """Token-budget mixing: the scarce source keeps everything; after
    hash-downsampling, realized token shares land near the targets."""
    from bbt_etl_dw_spark.operators.textstats import (
        apply_token_mix,
        token_mix_rates,
        whitespace_token_count,
    )
    from pyspark.sql import functions as F

    rows = []
    did = 0
    for src, n_docs, tokens_per_doc in (("web", 600, 20), ("code", 150, 20), ("books", 300, 20)):
        for _ in range(n_docs):
            rows.append((did, src, " ".join(f"t{i}" for i in range(tokens_per_doc))))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    target = {"web": 0.3, "code": 0.4, "books": 0.3}

    rates = {r["source"]: r for r in token_mix_rates(docs, target).collect()}
    # code is the scarcest relative to its 40% share -> keeps everything
    assert abs(rates["code"]["keep_rate"] - 1.0) < 1e-12
    # exact rate math: T = 150*20/0.4 = 7500; web keeps 0.3*7500/12000
    assert abs(rates["web"]["keep_rate"] - 0.3 * 7500 / 12000) < 1e-12
    assert abs(rates["books"]["keep_rate"] - 0.3 * 7500 / 6000) < 1e-12

    mixed = apply_token_mix(docs, token_mix_rates(docs, target))
    got = {
        r["source"]: r["n"]
        for r in mixed.groupBy("source")
        .agg(F.sum(whitespace_token_count("text")).alias("n"))
        .collect()
    }
    total = sum(got.values())
    for src, share in target.items():
        assert abs(got[src] / total - share) < 0.08, (src, got)
    # deterministic: second application identical
    again = apply_token_mix(docs, token_mix_rates(docs, target))
    assert {r.doc_id for r in mixed.collect()} == {r.doc_id for r in again.collect()}


def test_chunk_documents_null_text_and_case(spark):
    """NULL-text docs must produce NO chunks (not a phantom full-size
    chunk), and chunk_text must preserve the source casing — chunks feed
    embedders and provenance checks, not the normalized-token pipeline."""
    from bbt_etl_dw_spark.operators.textstats import chunk_documents

    df = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "The US GDP Grew")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=8, overlap=3).collect()
    assert {r["doc_id"] for r in out} == {3}
    assert out[0]["chunk_text"] == "The US GDP Grew"  # casing intact
    assert out[0]["n_tokens"] == 4


def test_winsorize_nan_and_integer_columns(spark):
    """NaN is an invalid value, not a big one: it must pass through, not
    be rewritten into the upper bound. Integer columns keep their type."""
    import math

    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.operators.clean import winsorize

    rows = [(i, float(i), i) for i in range(1, 100)]
    rows.append((100, float("nan"), 10_000_000))
    df = spark.createDataFrame(rows, "k long, v double, q long")
    out = winsorize(df, ["v", "q"], lower_pct=0.02, upper_pct=0.98)
    assert dict(out.dtypes)["q"] == "bigint"  # no silent double promotion
    nan_row = out.filter("k = 100").first()
    assert math.isnan(nan_row["v"])           # NaN passes through
    assert nan_row["q"] <= 99                 # the int outlier IS capped
    assert out.filter(F.col("q") > 99).count() == 0


def test_token_mix_raises_on_absent_target_source(spark):
    import pytest as _pytest

    from bbt_etl_dw_spark.operators.textstats import token_mix_rates

    docs = spark.createDataFrame(
        [(1, "web", "a b c"), (2, "books", "d e f")],
        "doc_id long, source string, text string",
    )
    with _pytest.raises(ValueError, match="code"):
        token_mix_rates(docs, {"web": 0.3, "code": 0.4, "books": 0.3})


def test_token_mix_raises_on_zero_token_source(spark):
    """A source PRESENT but with zero total tokens (all-blank docs after
    an upstream filter) is the same failure as an absent one: letting it
    through makes T = min(available/share) = 0 and silently empties the
    whole mixed corpus."""
    import pytest as _pytest

    from bbt_etl_dw_spark.operators.textstats import token_mix_rates

    docs = spark.createDataFrame(
        [(1, "web", "a b c"), (2, "code", "   "), (3, "books", "d e f")],
        "doc_id long, source string, text string",
    )
    with _pytest.raises(ValueError, match="code"):
        token_mix_rates(docs, {"web": 0.3, "code": 0.4, "books": 0.3})


def test_winsorize_nan_heavy_column_still_caps(spark):
    """When the NaN fraction exceeds 1-upper_pct, the bounds pass must not
    return NaN as the upper bound (least(x, NaN) leaves x unchanged and
    silently disables capping). NaN is excluded from the bounds pass."""
    import math

    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.operators.clean import winsorize

    rows = [(i, float(i)) for i in range(1, 11)]          # 1..10
    rows += [(100 + i, float("nan")) for i in range(10)]  # 50% NaN
    rows.append((200, 10_000.0))                          # the outlier
    df = spark.createDataFrame(rows, "k long, v double")
    out = winsorize(df, ["v"], lower_pct=0.05, upper_pct=0.60)
    capped = out.filter("k = 200").first()["v"]
    assert not math.isnan(capped) and capped <= 10.0  # upper cap ACTIVE
    assert out.filter(F.isnan("v")).count() == 10     # NaN untouched


def test_dedup_clusters_string_ids(spark):
    """Connected components over STRING ids (md5/URL doc ids): the
    numeric-sum convergence certificate must not apply — string ids take
    the join+count detector and still converge to exact components
    (regression: decimal cast of string labels would either throw under
    ANSI or NULL out and fake one-round convergence, silently splitting
    the chain)."""
    from bbt_etl_dw_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "id_a string, id_b string",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(pairs, max_iters=10).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_jpeg_header_fill_bytes_and_tight_buffer(spark):
    """JPEG markers may be padded by runs of 0xFF fill bytes, and a
    truncated fetch whose SOF dims end exactly at the buffer must still
    parse (regression: the walker treated a fill FF as a marker with a
    length field and jumped into the segment body; the loop bound also
    required one spare byte past the dims)."""
    import struct

    from bbt_etl_dw_spark.operators import multimodal as _mm

    # SOI, APP0, FF fill bytes, then SOF0 whose payload ends the buffer
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"
        + b"\xff\xff\xff"                       # fill run
        + b"\xc0" + struct.pack(">H", 8) + b"\x08"
        + struct.pack(">HH", 11, 7)             # height=11 width=7, buffer ends here
    )
    df = spark.createDataFrame(
        [(1, "image", bytearray(jpeg), "image/jpeg", "mem://t.jpg")],
        _mm.MEDIA_SCHEMA,
    )
    got = decode_media(df, headers_only=True).first()
    assert (got["width"], got["height"]) == (7, 11)


def test_dedup_clusters_reliable_checkpoint_matches_local(spark, tmp_path):
    """reliable_checkpoint=True (the documented real-cluster path:
    checkpoint() into a durable dir, surviving executor loss) produces
    clusters identical to the default localCheckpoint path — including
    under the star fallback, whose rounds also checkpoint (VERDICT r05
    #5: the path was documented but untested)."""
    from bbt_etl_dw_spark.operators.dedup import dedup_clusters

    # chain + clique + pair: exercises multi-round propagation
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        "id_a long, id_b long",
    )
    # long chain: forces the star fallback under a tiny max_iters
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    prev_dir = spark.sparkContext.getCheckpointDir()
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        for df in (pairs, chain):
            local = {
                (r.doc_id, r.cluster_id)
                for r in dedup_clusters(df, max_iters=3).collect()
            }
            reliable = {
                (r.doc_id, r.cluster_id)
                for r in dedup_clusters(
                    df, max_iters=3, reliable_checkpoint=True
                ).collect()
            }
            assert reliable == local and len(local) > 0
    finally:
        if prev_dir is not None:
            spark.sparkContext.setCheckpointDir(prev_dir)


def test_bpe_even_run_merges_all_pairs(spark):
    """Review finding: the old space-delimited string replace consumed
    the shared boundary space between adjacent matches, so an EVEN run
    merged only every other pair ('aaaa' -> [aa, a, a]) — diverging from
    reference BPE. The greedy array fold merges left-to-right
    non-overlapping: 'aaaa' -> [aa, aa], 'aaaaa' -> [aa, aa, a]."""
    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.operators.bpe import apply_merges

    toks = (
        spark.createDataFrame([("aaaa",), ("aaaaa",), ("aa",)], ["w"])
        .select("w", apply_merges(F.col("w"), [("a", "a")]).alias("t"))
        .collect()
    )
    got = {r["w"]: list(r["t"]) for r in toks}
    assert got["aaaa"] == ["aa", "aa", "</w>"]
    assert got["aaaaa"] == ["aa", "aa", "a", "</w>"]
    assert got["aa"] == ["aa", "</w>"]


def test_bpe_word_frequencies_ignores_blank_docs(spark):
    from bbt_etl_dw_spark.operators.bpe import word_frequencies

    docs = spark.createDataFrame(
        [(1, "ab ab"), (2, ""), (3, "   ")], ["doc_id", "text"]
    )
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    assert wf == {"ab": 2}  # no '' word from blank docs


def test_sample_frames_zero_frame_rows_emit_nothing(spark):
    """Review finding: sequence(0, -1, 10) threw 'illegal sequence
    boundaries' for the whole job on the first empty/corrupt video row;
    such rows now emit zero frames while healthy rows are unaffected."""
    from bbt_etl_dw_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, 25), (2, 0), (3, 1)], "media_id int, n_frames int"
    )
    got = {
        (r["media_id"], r["frame_index"])
        for r in sample_frames(df, every_n=10).collect()
    }
    assert got == {(1, 0), (1, 10), (1, 20), (3, 0)}


def test_jaccard_hot_shingle_guard_raises(spark):
    """r08 review (basket-guard class): a shingle shared by more docs than
    max_shingle_df_guard would fan ~f^2/2 pairs out of one join key — the
    guard raises loudly instead; results are bit-exact whenever it passes."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from bbt_etl_dw_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, f"shared boiler plate unique{i} tail{i} end{i}") for i in range(6)],
        "doc_id long, text string",
    )
    # 'shared boiler plate' appears in all 6 docs
    with pytest.raises((SparkRuntimeException, Py4JJavaError), match="max_shingle_df_guard"):
        ngram_jaccard_pairs(
            docs, "doc_id", "text", max_shingle_df_guard=5
        ).collect()
    # at/above the true df the guard passes and results match guard-off
    on = sorted(map(tuple, ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.1, max_shingle_df_guard=6
    ).collect()))
    off = sorted(map(tuple, ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.1, max_shingle_df_guard=None
    ).collect()))
    assert on == off and on  # non-empty: the shared shingle pairs them


def test_winsorized_stats_builder_uses_exact_bounds(spark, sf_dir, monkeypatch):
    """r13 (supersedes the r11 accuracy-override fix): percentile_approx
    with accuracy >= row count is still not rank-exact after partition-
    summary merges (+-1 rank slack, red at sf0.1 against quantile_disc),
    so the builder must request winsorize's exact percentile_disc mode —
    the only bounds path that equals the oracle at every sf."""
    import bbt_etl_dw_spark.operators.clean as clean_mod
    from bbt_etl_dw_spark.suite import load_all

    seen = {}
    real = clean_mod.winsorize

    def spy(df, cols, lower_pct=0.01, upper_pct=0.99, accuracy=10000, exact=False):
        seen["exact"] = exact
        return real(df, cols, lower_pct, upper_pct, accuracy, exact)

    monkeypatch.setattr(clean_mod, "winsorize", spy)
    load_all()["lineitem_winsorized_stats"].builder(spark, sf_dir).collect()
    assert seen["exact"] is True


def test_winsorize_exact_picks_ansi_disc_rank(spark):
    """winsorize(exact=True) must clip at the ceil(q*n)-th order
    statistic (ANSI percentile_disc / DuckDB quantile_disc) even when
    q*n lands exactly on an integer rank across a multi-partition
    aggregate — the configuration where the approx sketch's post-merge
    rank slack picks the neighboring element (the sf0.1 sweep red)."""
    from pyspark.sql import functions as F

    from bbt_etl_dw_spark.operators.clean import winsorize

    n = 200
    df = spark.range(1, n + 1).repartition(8).select(
        F.col("id").cast("double").alias("v")
    )
    # q*n integer on both tails: lower rank ceil(0.02*200)=4 -> bound 4.0,
    # upper rank ceil(0.98*200)=196 -> bound 196.0
    out = winsorize(df, ["v"], lower_pct=0.02, upper_pct=0.98, exact=True)
    lo, hi = out.agg(F.min("v"), F.max("v")).first()
    assert (lo, hi) == (4.0, 196.0)
    # non-integer q*n for completeness: ceil(0.985*200)=197
    out2 = winsorize(df, ["v"], lower_pct=0.005, upper_pct=0.985, exact=True)
    lo2, hi2 = out2.agg(F.min("v"), F.max("v")).first()
    assert (lo2, hi2) == (1.0, 197.0)
    assert out.count() == n  # capping never drops rows


def test_dirty_csv_fixture_stages_once_across_sf_dirs():
    """ADVICE r11: the dirty-CSV fixture is static (sf-independent), so
    two different sf_dir values must resolve to the SAME staged file —
    no duplicate temp dirs for identical bytes."""
    from bbt_etl_dw_spark.suite.ingest import _dirty_csv_path

    a = _dirty_csv_path("/root/testdata/sf0.001")
    b = _dirty_csv_path("/root/testdata/sf0.01")
    assert a == b

"""Unit tests for the text / similarity / multimodal function layer.

Oracle parity covers the registered queries; these tests cover the
invariants of the hash-seed-dependent operators (rows-only in the
driver gate) with planted duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_kafka_replicator_spark.functions import multimodal, text
from flink_kafka_replicator_spark.functions.similarity import (
    as_double,
    band_keys,
    cosine,
    hamming64,
    hyperplane_bucket,
    jaccard,
    lsh_candidate_pairs,
    minhash_signature,
    simhash,
    word_shingles,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the birds sing in the tall green trees outside"
)
NEAR = BASE.replace("lazy dog", "lazy wolf")  # one-word edit → near dup
FAR = "completely different content about spark query engines and shuffles at scale"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, BASE), (1, NEAR), (2, FAR), (3, BASE)], "doc_id bigint, text string"
    )


def test_minhash_lsh_finds_planted_near_dup(docs):
    sh = docs.select("doc_id", word_shingles("text").alias("shingles"))
    banded = sh.select(
        "doc_id",
        F.explode(band_keys(minhash_signature(F.col("shingles")))).alias("band_key"),
    )
    pairs = {
        (r.id_a, r.id_b) for r in lsh_candidate_pairs(banded, "doc_id").collect()
    }
    assert (0, 3) in pairs, "identical docs must always collide in every band"
    assert (0, 1) in pairs or (1, 3) in pairs, "near dup should collide in some band"


def test_jaccard_bounds(docs):
    sh = docs.select("doc_id", word_shingles("text").alias("shingles"))
    a = sh.filter("doc_id = 0").select(F.col("shingles").alias("sh_a"))
    b = sh.filter("doc_id = 3").select(F.col("shingles").alias("sh_b"))
    j_same = a.crossJoin(b).select(jaccard(F.col("sh_a"), F.col("sh_b")).alias("j"))
    assert j_same.collect()[0].j == 1.0
    c = sh.filter("doc_id = 2").select(F.col("shingles").alias("sh_b"))
    j_diff = a.crossJoin(c).select(jaccard(F.col("sh_a"), F.col("sh_b")).alias("j"))
    assert j_diff.collect()[0].j == 0.0


def test_simhash_invariants(docs):
    sims = {
        r.doc_id: r.sim
        for r in docs.select(
            "doc_id", simhash(F.split("text", " ")).alias("sim")
        ).collect()
    }
    assert sims[0] == sims[3], "identical text → identical simhash"
    two = docs.sparkSession.createDataFrame(
        [(sims[0], sims[1]), (sims[0], sims[2])], "a bigint, b bigint"
    )
    h = [r.h for r in two.select(hamming64(F.col("a"), F.col("b")).alias("h")).collect()]
    assert h[0] < h[1], "near dup must be closer in hamming space than far text"
    assert h[0] <= 12


def test_embedding_lsh_and_cosine(spark):
    base = [float(i % 7 - 3) for i in range(64)]
    near = list(base)
    near[0] += 0.01
    orth = [0.0] * 64
    orth[1] = 5.0
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, orth)], "vec_id bigint, embedding array<double>"
    )
    v = df.select("vec_id", as_double(F.col("embedding")).alias("vec"))
    bucketed = v.withColumn("bucket", hyperplane_bucket(F.col("vec")))
    buckets = {r.vec_id: r.bucket for r in bucketed.collect()}
    assert buckets[0] == buckets[1], "near-identical vectors share all sign bits"
    a = v.filter("vec_id = 0").select(F.col("vec").alias("va"))
    b = v.filter("vec_id = 1").select(F.col("vec").alias("vb"))
    cos = a.crossJoin(b).select(cosine(F.col("va"), F.col("vb")).alias("c")).collect()
    assert cos[0].c > 0.999


def test_ivf_matches_bruteforce_top1(spark, sf_dir):
    from flink_kafka_replicator_spark.functions.pipeline_queries import (
        sim_topk_cosine,
        sim_topk_ivf,
    )

    bf = sim_topk_cosine(spark, sf_dir).collect()
    ivf = sim_topk_ivf(spark, sf_dir).collect()
    assert bf[0].vec_id == ivf[0].vec_id, "nprobe=4/16 must recover the top hit here"
    ivf_ids = {r.vec_id for r in ivf}
    bf_ids = {r.vec_id for r in bf}
    assert len(ivf_ids & bf_ids) >= 5, "IVF recall@10 should be ≥ 0.5 on this data"


def test_kmeans_ivf_recall_not_worse_than_fixed_seeds(spark):
    """Learned (2-Lloyd-round) centroids must not lose recall vs the
    raw seed vectors: mean recall@10 over an 8-query panel, through the
    real Spark search path at sf0.01 (a single query's recall@10 is too
    noisy to rank quantizers). Truth per query reuses the identical
    arithmetic with every list probed."""
    import math

    from flink_kafka_replicator_spark.functions import pipeline_queries as pq
    from flink_kafka_replicator_spark.io import load_table

    sf = "/root/testdata/sf0.01"
    e = load_table(spark, sf, "embeddings")
    fixed, _ = pq._ivf_model(spark, sf)
    learned = pq._kmeans_centroids(spark, sf)
    panel = [
        [math.sin(i + 1 + 0.37 * t) for i in range(64)] for t in range(8)
    ]

    def ids(cents, probes, q):
        return {
            r["vec_id"]
            for r in pq._ivf_search(e, cents, probes, qvec=q).collect()
        }

    def recall(cents, q):
        truth = ids(cents, [cid for cid, _, _ in cents], q)
        got = ids(cents, pq._probe_nearest(cents, qvec=q), q)
        return len(got & truth)

    mean_fixed = sum(recall(fixed, q) for q in panel) / len(panel)
    mean_learned = sum(recall(learned, q) for q in panel) / len(panel)
    assert mean_learned >= mean_fixed, (
        f"k-means IVF lost recall: {mean_learned} < {mean_fixed}"
    )


def test_approx_distinct_within_hll_error_bound(spark, sf_dir):
    """agg_approx_distinct stays rows-only for the driver (approximate
    results differ across engines by design); this pins the invariant
    instead: HLL++ at rsd=0.02 must land within 5% relative error of
    the exact per-group countDistinct (comfortably above the
    documented ~3-sigma bound)."""
    from flink_kafka_replicator_spark.io import load_table
    from flink_kafka_replicator_spark.operators.aggregates import (
        agg_approx_distinct,
    )

    import pyspark.sql.functions as F

    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in agg_approx_distinct(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["exact_parts"]
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("exact_parts"))
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, ex in exact.items():
        rel = abs(approx[flag] - ex) / ex
        assert rel <= 0.05, f"group {flag}: {approx[flag]} vs {ex} ({rel:.2%})"


def test_materialize_small_prefers_reliable_checkpoint_dir(spark, tmp_path):
    """With a checkpoint dir configured, materialize_small must route
    through the fault-tolerant checkpoint store (files on disk), not
    executor-local blocks — executor loss then recomputes nothing."""
    from flink_kafka_replicator_spark.io import materialize_small

    spark.sparkContext.setCheckpointDir(str(tmp_path))
    df = materialize_small(spark.range(100))
    assert df.count() == 100
    ck_files = [p for p in tmp_path.rglob("*") if p.is_file()]
    assert ck_files, "no blocks written to the reliable checkpoint dir"


def test_lang_id_is_deterministic_heuristic(spark):
    df = spark.createDataFrame(
        [(0, "the cat and the dog of the house is a friend"),
         (1, "el perro y la casa de la madre que y el")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.p for r in df.select("doc_id", text.predicted_lang("text").alias("p")).collect()}
    assert out[0] == "en"
    assert out[1] == "es"


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame([(0, "abcdefgh" * 4), (1, "xy")], "doc_id bigint, text string")
    blobs = multimodal.with_blob(df)
    meta = {r.doc_id: r for r in multimodal.blob_meta(blobs).collect()}
    assert meta[0].n_bytes == 32
    assert meta[0].header_hex == "61626364"
    img = {r.doc_id: r for r in multimodal.decode_image_meta(blobs).collect()}
    assert img[0].width >= 16 and img[0].channels in (1, 3)
    img2 = {r.doc_id: r for r in multimodal.decode_image_meta(blobs).collect()}
    assert img2[0].width == img[0].width, "fake decode must be deterministic"
    frames = multimodal.sample_frames(blobs, n_frames=4).collect()
    assert sum(1 for r in frames if r.doc_id == 0) == 4
    assert sum(1 for r in frames if r.doc_id == 1) == 2, "short payload → fewer frames"
    # real codec on non-media payloads: per-row 'unknown', never abort
    real = {
        r.doc_id: r
        for r in multimodal.decode_image_meta(
            blobs, use_fake_codec=False
        ).collect()
    }
    assert real[0].format == "unknown" and real[0].width is None


def test_multimodal_real_image_decode(spark):
    """Round 8: the real image-decode path parses actual container
    headers (PIL when importable, pure-stdlib parsers here) — crafted
    minimal PNG/GIF/BMP/JPEG payloads must yield their true geometry,
    and garbage must degrade per-row to nulls."""
    import struct

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 320, 200)
        + bytes([8, 6, 0, 0, 0])
    )
    gif = b"GIF89a" + struct.pack("<HH", 640, 480) + b"\x00\x00\x00"
    bmp = (
        b"BM"
        + struct.pack("<IHHI", 0, 0, 0, 54)
        + struct.pack("<iiiHH", 40, 256, 128, 1, 24)
        + b"\x00" * 8
    )
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 17) + bytes([8])
        + struct.pack(">HH", 240, 360) + bytes([3]) + b"\x00" * 10
    )
    rows = [(0, png), (1, gif), (2, bmp), (3, jpeg), (4, b"not an image")]
    df = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    got = {
        r.doc_id: (r.width, r.height, r.channels, r.format)
        for r in multimodal.decode_image_meta(
            df, use_fake_codec=False
        ).collect()
    }
    assert got[0] == (320, 200, 4, "png")
    assert got[1] == (640, 480, 3, "gif")
    assert got[2] == (256, 128, 3, "bmp")
    assert got[3] == (360, 240, 3, "jpeg")
    assert got[4] == (None, None, None, "unknown")


def test_multimodal_real_audio_decode(spark):
    """Round 8: the real audio path decodes RIFF/WAV PCM with stdlib
    wave (soundfile when importable); non-audio degrades to nulls."""
    import io
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"\x00\x00" * 32000)
    df = spark.createDataFrame(
        [(0, buf.getvalue()), (1, b"not audio")],
        "doc_id bigint, blob binary",
    )
    got = {
        r.doc_id: (r.sample_rate, r.n_samples, r.duration_ms, r.n_windows)
        for r in multimodal.decode_audio_meta(
            df, use_fake_codec=False
        ).collect()
    }
    assert got[0] == (16000, 32000, 2000, 31)
    assert got[1] == (None, None, None, None)


def test_rolling_fingerprint_shift_invariance(spark):
    df = spark.createDataFrame(
        [(0, "abcdefghij"), (1, "XXabcdefghij")], "doc_id bigint, text string"
    )
    fps = {
        r.doc_id: r.fp
        for r in df.select(
            "doc_id", text.rolling_fingerprint("text").alias("fp")
        ).collect()
    }
    base_grams = {"abcde", "bcdef", "cdefg", "defgh", "efghi", "fghij"}
    import hashlib

    expected_min = min(hashlib.md5(g.encode()).hexdigest() for g in base_grams)
    assert fps[0] == expected_min, "fingerprint = min md5 over char 5-grams"


def test_stratified_sample_is_seeded_and_proportional(spark, sf_dir):
    from flink_kafka_replicator_spark.functions.pipeline_queries import (
        sample_stratified,
    )

    a = sample_stratified(spark, sf_dir).groupBy("lang").count().collect()
    b = sample_stratified(spark, sf_dir).groupBy("lang").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)), "seed must pin the sample"
    got = {r.lang: r["count"] for r in a}
    # non-en strata keep every row; en is downsampled to ~half
    from flink_kafka_replicator_spark.io import load_table

    base = {
        r.lang: r["count"]
        for r in load_table(spark, sf_dir, "documents").groupBy("lang").count().collect()
    }
    for lang in ("de", "fr", "es", "zh"):
        assert got[lang] == base[lang], f"{lang} stratum must be kept whole"
    assert 0.3 * base["en"] <= got["en"] <= 0.7 * base["en"]


def test_doc_chunk_reassembles_to_original(spark, sf_dir):
    """Chunk invariants: stride-40/width-50 chunks must cover every
    token, overlap by exactly 10, and reassemble to the original
    document (first stride tokens of each chunk + the tail of the
    last)."""
    from flink_kafka_replicator_spark.functions.corpus import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        doc_chunk,
    )
    from flink_kafka_replicator_spark.io import load_table

    chunks = doc_chunk(spark, sf_dir).collect()
    originals = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(50)
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        if r["doc_id"] in originals:
            by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(originals)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        toks = originals[doc_id]
        assert rows[0]["chunk_id"] == 0
        rebuilt: list[str] = []
        for r in rows[:-1]:
            ctoks = r["chunk_text"].split(" ")
            assert len(ctoks) == min(CHUNK_TOKENS, len(toks) - r["chunk_id"] * CHUNK_STRIDE)
            rebuilt.extend(ctoks[:CHUNK_STRIDE])
        rebuilt.extend(rows[-1]["chunk_text"].split(" "))
        assert rebuilt == toks, f"doc {doc_id} does not reassemble"


def test_percentile_approx_within_rank_error(spark, sf_dir):
    """percentile_approx(accuracy=1000) must land within the documented
    rank error (~1/accuracy) of the exact percentile: compare the
    approx VALUE against exact percentiles at p ± 2/accuracy — the
    approx answer must sit inside that value bracket per group."""
    from flink_kafka_replicator_spark.io import load_table
    from flink_kafka_replicator_spark.operators.aggregates import (
        agg_percentile_approx,
    )

    eps = 2.0 / 1000
    approx = {
        r["l_returnflag"]: (r["p50_approx"], r["p95_approx"])
        for r in agg_percentile_approx(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    for p_lo, p_hi, idx in ((0.5 - eps, 0.5 + eps, 0), (0.95 - eps, 0.95 + eps, 1)):
        brackets = {
            r["l_returnflag"]: (r["lo"], r["hi"])
            for r in li.groupBy("l_returnflag")
            .agg(
                F.expr(f"percentile(l_extendedprice, {p_lo})").alias("lo"),
                F.expr(f"percentile(l_extendedprice, {p_hi})").alias("hi"),
            )
            .collect()
        }
        for flag, (lo, hi) in brackets.items():
            got = approx[flag][idx]
            assert lo <= got <= hi, f"{flag} p{idx}: {got} outside [{lo}, {hi}]"


def test_hll_sketch_union_estimates_within_bound(spark, sf_dir):
    """Mergeable-sketch invariant: per-group estimates AND the unioned
    estimate land within 5% of the exact distinct counts — union must
    not degrade accuracy beyond the HLL bound."""
    from flink_kafka_replicator_spark.io import load_table
    from flink_kafka_replicator_spark.operators.aggregates import (
        agg_hll_sketch_union,
    )

    est = {
        r["l_returnflag"]: r["distinct_est"]
        for r in agg_hll_sketch_union(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("n"))
        .collect()
    }
    exact["__union__"] = li.select("l_partkey").distinct().count()
    for k, ex in exact.items():
        rel = abs(est[k] - ex) / ex
        assert rel <= 0.05, f"{k}: est {est[k]} vs exact {ex} ({rel:.2%})"

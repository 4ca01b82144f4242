"""Round-5 operator invariants: the scale-safe variants of the two
lang-keyed-window operators (hash-threshold mixture equalize, shard-keyed
sequence packing).

The correctness story for both is already carried by the DuckDB oracle
(exact hash-match); these tests pin the SEMANTIC claims the oracle can't
express: sampling-error bounds, shard-locality of pack streams, and
equivalence of the sharded bookkeeping to an independent Python fold.
"""

from __future__ import annotations

import hashlib
import os
from collections import defaultdict

from flink_kafka_replicator_spark.functions.corpus import (
    PACK_BUDGET_TOKENS,
    corpus_mix_equalize,
    corpus_mix_equalize_hash,
    pack_assign,
    pack_token_sequences,
    pack_token_sequences_sharded,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# ------------------------------------------------ corpus_mix_equalize_hash


def test_mix_hash_counts_concentrate_on_quota(spark):
    """Hash-threshold sampling trades exact per-lang counts for scan
    speed; the error must stay within a binomial concentration bound:
    |kept - quota| <= 4*sqrt(quota) per language (fails with prob
    ~1e-4 per lang if the sampler were biased, never in practice for a
    correct uniform hash)."""
    rows = corpus_mix_equalize_hash(spark, SF_DIR).collect()
    assert rows
    exact = corpus_mix_equalize(spark, SF_DIR).collect()
    quota = max(r.rank_in_lang for r in exact)  # the exact variant's min_n
    kept = defaultdict(int)
    for r in rows:
        kept[r.lang] += 1
    bound = 4 * quota**0.5
    for lang, n in kept.items():
        assert abs(n - quota) <= bound, (
            f"{lang}: kept {n}, quota {quota}, bound ±{bound:.1f}"
        )


def test_mix_hash_keeps_all_of_smallest_lang(spark):
    """The smallest language's keep-fraction is exactly 1.0, and a
    52-bit md5 fraction is always < 1.0 — so the quota language must
    survive in full (the equalizer may only ever DOWN-sample others)."""
    from flink_kafka_replicator_spark.io import load_table

    kept = defaultdict(set)
    for r in corpus_mix_equalize_hash(spark, SF_DIR).collect():
        kept[r.lang].add(r.doc_id)
    # raw corpus counts (NOT the equalized output — that holds exactly
    # min_n docs for every language by construction)
    raw = defaultdict(set)
    for r in load_table(spark, SF_DIR, "documents").select("doc_id", "lang").collect():
        raw[r.lang].add(r.doc_id)
    quota = min(len(v) for v in raw.values())
    smallest = [l for l, v in raw.items() if len(v) == quota]
    assert smallest
    for lang in smallest:
        assert kept[lang] == raw[lang], f"{lang}: quota lang must survive in full"


def test_mix_hash_is_content_stable_under_growth(spark):
    """A doc's keep/drop decision depends only on its own hash and the
    per-lang fraction — so lowering the fraction (corpus growth: quota
    shrinks relative to a growing language) can only REMOVE docs, never
    swap one for another. This is the property that makes the sampler
    reproducible shard-by-shard at 100 TB: membership is a pure
    function, not a rank in a global sort."""
    from pyspark.sql import functions as F

    from flink_kafka_replicator_spark.functions.corpus import (
        _MIX_HASH_DEN,
        _MIX_HASH_HEX,
    )
    from flink_kafka_replicator_spark.io import load_table

    d = load_table(spark, SF_DIR, "documents")
    hfrac = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, _MIX_HASH_HEX),
            16,
            10,
        ).cast("double")
        / F.lit(_MIX_HASH_DEN)
    )
    staged = d.select("doc_id", "lang", hfrac.alias("h"))
    at_60 = {r.doc_id for r in staged.filter(F.col("h") < 0.6).collect()}
    at_30 = {r.doc_id for r in staged.filter(F.col("h") < 0.3).collect()}
    assert at_30 <= at_60, "tightening the fraction must only shrink the set"


# ------------------------------------------------ pack_token_sequences_sharded


def _md5_order_key(doc_id):
    return (hashlib.md5(str(doc_id).encode()).hexdigest(), doc_id)


def test_pack_sharded_covers_corpus_exactly_once(spark):
    """Sharding the pack streams must not drop or duplicate documents:
    the union over (lang, shard) streams is a partition of the corpus,
    and every stream chains its offsets exactly like the single-stream
    form does within a language."""
    rows = pack_token_sequences_sharded(spark, SF_DIR).collect()
    assert rows
    single = pack_token_sequences(spark, SF_DIR).collect()
    assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in single)
    by_stream = defaultdict(list)
    for r in rows:
        assert 0 <= r.pack_offset < PACK_BUDGET_TOKENS
        by_stream[(r.lang, r.shard)].append(r)
    assert len(by_stream) > 5, "sharding must yield more streams than langs"
    for (lang, shard), rs in by_stream.items():
        rs.sort(key=lambda r: _md5_order_key(r.doc_id))
        cum = 0
        for r in rs:
            assert r.pack_id == cum // PACK_BUDGET_TOKENS, (lang, shard, r)
            assert r.pack_offset == cum % PACK_BUDGET_TOKENS, (lang, shard, r)
            cum += r.n_tokens


def test_pack_sharded_token_counts_agree_with_single_stream(spark):
    """Re-keying the window changes WHERE a doc lands, never its token
    count: per-doc n_tokens must be identical between the lang-keyed
    and (lang, shard)-keyed layouts, and so must each language's total
    token mass."""
    sharded = {r.doc_id: r for r in pack_token_sequences_sharded(spark, SF_DIR).collect()}
    single = {r.doc_id: r for r in pack_token_sequences(spark, SF_DIR).collect()}
    assert sharded.keys() == single.keys()
    for doc_id, r in sharded.items():
        assert r.n_tokens == single[doc_id].n_tokens
        assert r.lang == single[doc_id].lang


# ------------------------------------------------ property-based (hypothesis)

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_HSET = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_HSET)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 1),              # lang id
            st.integers(0, 3),              # shard id
            st.integers(0, 1500),           # n_tokens (0, and > budget of 512)
        ),
        min_size=1,
        max_size=20,
    )
)
def test_pack_assign_sharded_matches_python_reference(spark, docs):
    """pack_assign with a composite (lang, shard) key vs an independent
    Python cumsum per stream — including zero-token docs, docs longer
    than the budget, and single-doc streams. Pins that the sharded
    variant is EXACTLY per-stream concat-and-chunk, with no cross-shard
    leakage of the running total."""
    rows = [(i, f"l{lang}", shard, n) for i, (lang, shard, n) in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, shard int, n_tokens int"
    )
    got = {
        r.doc_id: (r.pack_id, r.pack_offset)
        for r in pack_assign(df, budget=512, keys=("lang", "shard")).collect()
    }
    want = {}
    by_stream = {}
    for doc_id, lang, shard, n in sorted(
        rows, key=lambda r: (r[1], r[2], *_md5_order_key(r[0]))
    ):
        cum = by_stream.get((lang, shard), 0)
        want[doc_id] = (cum // 512, cum % 512)
        by_stream[(lang, shard)] = cum + n
    assert got == want


# -------------------------------------------- dedup_incremental_indexed


def test_dedup_incremental_indexed_matches_unindexed(spark):
    """The persisted-index path is a physical rewrite only: identical
    (new_id, old_id, jaccard) rows to the self-contained bipartite
    dedup on the same old/new split."""
    from flink_kafka_replicator_spark.functions.pipeline_queries import (
        dedup_incremental,
        dedup_incremental_indexed,
    )

    base = {tuple(r) for r in dedup_incremental(spark, SF_DIR).collect()}
    idx = {tuple(r) for r in dedup_incremental_indexed(spark, SF_DIR).collect()}
    assert idx == base
    assert base, "fixture must contain at least one cross-batch near-dup"


def test_dedup_incremental_indexed_runs_no_aggregate_over_index(spark):
    """THE point of the artifact: the per-batch candidate plan counts
    band keys for the NEW batch only — the index side's hygiene comes
    from the persisted statistics as a pushed `n <= MAX_BUCKET` parquet
    filter, never a count-aggregate over the index's band table."""
    from pyspark.sql import functions as F

    from flink_kafka_replicator_spark.functions.pipeline_queries import (
        _bipartite_candidates,
        _minhash_index_dir,
    )
    from flink_kafka_replicator_spark.functions.similarity import (
        MAX_BUCKET,
        banded_minhash,
    )
    from flink_kafka_replicator_spark.io import load_table
    from flink_kafka_replicator_spark.plans.explain import formatted_plan
    from flink_kafka_replicator_spark.sinks import read_minhash_index

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    new = d.filter(F.col("doc_id") % 2 == 1)
    b_new = banded_minhash(new, "doc_id", "text").select(
        F.col("doc_id").alias("new_id"), "band_key"
    )

    # indexed path: ok_old is a filter over the persisted stats parquet
    bands_old, stats_old = read_minhash_index(
        spark, _minhash_index_dir(spark, SF_DIR)
    )
    indexed = formatted_plan(
        _bipartite_candidates(
            b_new,
            bands_old.select(F.col("doc_id").alias("old_id"), "band_key"),
            stats_old.filter(F.col("n") <= MAX_BUCKET).select("band_key"),
        )
    )

    # self-contained path: ok_old is a count-aggregate over the old half
    old = d.filter(F.col("doc_id") % 2 == 0)
    b_old = banded_minhash(old, "doc_id", "text").select(
        F.col("doc_id").alias("old_id"), "band_key"
    )
    ok_old_agg = (
        b_old.groupBy("band_key")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") <= MAX_BUCKET)
        .select("band_key")
    )
    unindexed = formatted_plan(_bipartite_candidates(b_new, b_old, ok_old_agg))

    n_idx, n_self = indexed.count("count(1)"), unindexed.count("count(1)")
    assert n_idx > 0, "the new batch's own hygiene count must remain"
    assert n_idx == n_self // 2, (
        f"indexed plan must drop the index-side aggregate: {n_idx} vs {n_self}"
    )
    assert "LessThanOrEqual(n," in indexed, (
        "MAX_BUCKET must reach the stats parquet scan as a pushed filter"
    )


# ------------------------------------------------ corpus_mix_temperature


def test_mix_temperature_keep_fractions(spark):
    """Temperature sampling must (a) keep the smallest language in full,
    (b) keep MORE of every language than full equalization (α>0 flattens
    less than α=0), and (c) land each language's kept count within a
    binomial concentration band of n_min^(1-α)·n_l^α."""
    from flink_kafka_replicator_spark.functions.corpus import (
        MIX_ALPHA,
        corpus_mix_temperature,
    )
    from flink_kafka_replicator_spark.io import load_table

    kept = defaultdict(set)
    for r in corpus_mix_temperature(spark, SF_DIR).collect():
        kept[r.lang].add(r.doc_id)
    raw = defaultdict(set)
    for r in load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang"
    ).collect():
        raw[r.lang].add(r.doc_id)
    n_min = min(len(v) for v in raw.values())
    smallest = min(raw, key=lambda k: len(raw[k]))
    assert kept[smallest] == raw[smallest], "smallest lang must survive whole"
    eq_kept = defaultdict(int)
    from flink_kafka_replicator_spark.functions.corpus import (
        corpus_mix_equalize_hash,
    )

    for r in corpus_mix_equalize_hash(spark, SF_DIR).collect():
        eq_kept[r.lang] += 1
    for lang, docs in raw.items():
        want = (n_min ** (1 - MIX_ALPHA)) * (len(docs) ** MIX_ALPHA)
        bound = 4 * want**0.5
        assert abs(len(kept[lang]) - want) <= bound, (
            f"{lang}: kept {len(kept[lang])}, want ~{want:.0f} ±{bound:.0f}"
        )
        assert len(kept[lang]) >= eq_kept[lang], (
            f"{lang}: temperature (α={MIX_ALPHA}) kept fewer than equalize"
        )

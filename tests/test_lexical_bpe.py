"""The lexical index's BPE analyzer (round 12 — VERDICT r11 task 6):
the trained tokenizer COMPOSED into the persisted lexical leg. The
merge list is part of the index's on-disk identity (persisted +
fingerprinted); build, append, and query tokenization all resolve it
from the artifact, never the building session."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from flink_kafka_replicator_spark import sinks
from flink_kafka_replicator_spark.functions import pipeline_queries as pq
from flink_kafka_replicator_spark.io import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _fixed_query(spark):
    return spark.createDataFrame(
        [(0, list(pq.BM25_QUERY_TERMS))], "qid int, terms array<string>"
    )


@pytest.fixture(scope="module")
def bpe_index(spark, tmp_path_factory):
    ix = str(tmp_path_factory.mktemp("lexbpe") / "index")
    sinks.write_lexical_index(spark, SF_DIR, ix, analyzer="bpe")
    return ix


def test_bpe_index_meta_carries_analyzer_fingerprint(spark, bpe_index):
    meta = sinks._read_lexindex_meta(bpe_index)
    az = meta["analyzer"]
    assert az["name"] == "bpe"
    assert az["n_merges"] == pq.BPE_TRAIN_MERGES
    merges = sinks._lex_load_merges(spark, bpe_index, meta)
    assert sinks._merges_fingerprint(merges) == az["fingerprint"]
    # the persisted list IS the session-trained list
    trained = [(a, b) for a, b, _ in pq._bpe_merges(spark, SF_DIR)]
    assert merges == trained


def test_bpe_served_fixed_query_matches_driver_green_session_query(
    spark, bpe_index
):
    """bm25_search_from_index over the BPE index, with the fixed query
    words tokenized through the persisted merges, must reproduce the
    driver-oracled in-session bm25_bpe_topk — scores to 4 decimals,
    same docs, same order."""
    served = sinks.bm25_search_from_index(
        spark, _fixed_query(spark), bpe_index, k=pq.BM25_TOP_K
    )
    got = [
        (r.doc_id, r.bm25)
        for r in served.orderBy("rank").collect()
    ]
    want = [
        (r.doc_id, r.bm25)
        for r in pq.bm25_bpe_topk(spark, SF_DIR).collect()
    ]
    assert got == want


def test_bpe_append_tokenizes_with_index_analyzer(spark, tmp_path):
    """append == rebuild under the BPE analyzer: the delta must
    tokenize with the PERSISTED merges, so an index grown in halves
    serves byte-equal to one built on the union."""
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    half = d.filter(F.col("doc_id") % 2 == 0)
    rest = d.filter(F.col("doc_id") % 2 == 1)

    grown = str(tmp_path / "grown")
    sinks.write_lexical_index(spark, SF_DIR, grown, df=half, analyzer="bpe")
    assert sinks.append_lexical_delta(rest, grown, 1)

    rebuilt = str(tmp_path / "rebuilt")
    sinks.write_lexical_index(spark, SF_DIR, rebuilt, analyzer="bpe")

    q = _fixed_query(spark)
    got = sorted(
        tuple(r)
        for r in sinks.bm25_search_from_index(spark, q, grown).collect()
    )
    want = sorted(
        tuple(r)
        for r in sinks.bm25_search_from_index(spark, q, rebuilt).collect()
    )
    assert got == want


def test_unknown_analyzer_refused(spark, bpe_index, tmp_path):
    """The refusal pattern: an index whose analyzer this engine cannot
    reproduce must fail loudly on search AND append, never tokenize
    differently."""
    import shutil

    ix = str(tmp_path / "alien")
    shutil.copytree(bpe_index, ix)
    mp = sinks._lexindex_meta_path(ix)
    meta = json.load(open(mp))
    meta["analyzer"]["name"] = "sentencepiece-v9"
    json.dump(meta, open(mp, "w"))

    with pytest.raises(ValueError, match="cannot reproduce"):
        sinks.bm25_search_from_index(
            spark, _fixed_query(spark), ix
        ).collect()
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    with pytest.raises(ValueError, match="cannot reproduce"):
        sinks.append_lexical_delta(d.limit(1), ix, 1)


def test_tampered_merges_refused(spark, bpe_index, tmp_path):
    """A merges artifact that no longer matches the committed
    fingerprint (torn write, hand edit) must refuse, not tokenize
    wrong."""
    import shutil

    ix = str(tmp_path / "torn")
    shutil.copytree(bpe_index, ix)
    spark.createDataFrame(
        [(1, "x", "y")], "merge_rank int, left string, right string"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{ix}/{sinks.LEX_MERGES_SUBDIR}"
    )
    with pytest.raises(ValueError, match="fingerprint"):
        sinks.bm25_search_from_index(
            spark, _fixed_query(spark), ix
        ).collect()


def test_pre_analyzer_index_defaults_to_whitespace(spark, tmp_path):
    """Back-compat: an index whose meta predates the analyzer key
    (rounds ≤11) keeps serving as the whitespace index it is."""
    ix = str(tmp_path / "oldlex")
    sinks.write_lexical_index(spark, SF_DIR, ix)
    mp = sinks._lexindex_meta_path(ix)
    meta = json.load(open(mp))
    del meta["analyzer"]
    json.dump(meta, open(mp, "w"))

    got = sinks.bm25_search_from_index(
        spark, _fixed_query(spark), ix, k=pq.BM25_TOP_K
    )
    want = pq.bm25_topk(spark, SF_DIR)
    assert [
        (r.doc_id, r.bm25) for r in got.orderBy("rank").collect()
    ] == [(r.doc_id, r.bm25) for r in want.collect()]


def test_bpe_subword_match(spark, bpe_index):
    """The point of a BPE analyzer: a query word UNSEEN as a whole
    token still matches documents through shared subword symbols —
    the whitespace index scores it zero."""
    q = spark.createDataFrame(
        # a nonsense word made of corpus-frequent characters: its BPE
        # symbols exist in the postings even though the word never does
        [(0, ["sparkjoin"])],
        "qid int, terms array<string>",
    )
    hits = sinks.bm25_search_from_index(spark, q, bpe_index, k=5).count()
    assert hits > 0

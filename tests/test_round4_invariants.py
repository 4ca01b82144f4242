"""Value invariants for the round-4 operators — properties the oracle
hash can't express (monotonicity, budget bounds, neighbor symmetry)."""

from __future__ import annotations

import os
from collections import defaultdict

from flink_kafka_replicator_spark.functions.corpus import (
    PACK_BUDGET_TOKENS,
    corpus_mix_equalize,
    doc_pii_scrub,
    pack_token_sequences,
)
from flink_kafka_replicator_spark.functions.pipeline_queries import KNN_K, knn_ivf_join
from flink_kafka_replicator_spark.operators.advanced import sessionize_events

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_session_seq_monotone_and_dense(spark):
    """Per user, session numbers start at 1 and only ever step by 0/+1
    in event order — a gap in the numbering means the running-sum flag
    miscounted."""
    from flink_kafka_replicator_spark.io import load_table

    order = {
        r.event_id: (r.user_id, r.ts)
        for r in load_table(spark, SF_DIR, "events").collect()
    }
    per_user = defaultdict(list)
    for r in sessionize_events(spark, SF_DIR).collect():
        uid, ts = order[r.event_id]
        per_user[r.user_id].append((ts, r.event_id, r.session_seq))
    for uid, rows in per_user.items():
        rows.sort()
        seqs = [s for _, _, s in rows]
        assert seqs[0] == 1, f"user {uid} starts at {seqs[0]}"
        for a, b in zip(seqs, seqs[1:]):
            assert b - a in (0, 1), f"user {uid} jumps {a}->{b}"


def test_pii_scrub_leaves_no_pii_behind(spark):
    """Redaction completeness, verified INDEPENDENTLY of Spark's regex
    engine: rebuild the injected text in Python, apply the same chained
    redaction with `re`, assert (a) zero PII matches remain in the
    Python-redacted text, and (b) its md5 equals the query's clean_hash
    — so the Spark redaction is provably the complete one, not merely
    self-consistent with the DuckDB oracle."""
    import hashlib
    import re

    from flink_kafka_replicator_spark.functions.corpus import (
        PII_EMAIL,
        PII_IP,
        PII_PHONE,
    )
    from flink_kafka_replicator_spark.io import load_table

    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }
    rows = doc_pii_scrub(spark, SF_DIR).collect()
    assert rows and all(r.n_emails >= 1 for r in rows)
    for r in rows:
        t = texts[r.doc_id] + f" contact user{r.doc_id}@mail.example.com"
        if r.doc_id % 3 == 0:
            t += f" call 555-{r.doc_id % 10000:04d}"
        if r.doc_id % 5 == 0:
            t += f" host 10.0.{r.doc_id % 256}.7"
        assert len(re.findall(PII_EMAIL, t)) == r.n_emails
        assert len(re.findall(PII_PHONE, t)) == r.n_phones
        assert len(re.findall(PII_IP, t)) == r.n_ips
        clean = re.sub(
            PII_IP, "<IP>", re.sub(PII_PHONE, "<PHONE>", re.sub(PII_EMAIL, "<EMAIL>", t))
        )
        for pat in (PII_EMAIL, PII_PHONE, PII_IP):
            assert not re.search(pat, clean), f"doc {r.doc_id}: PII survived redaction"
        assert hashlib.md5(clean.encode()).hexdigest() == r.clean_hash, (
            f"doc {r.doc_id}: Spark redaction differs from the Python reference"
        )


def test_mix_equalize_exactly_balanced(spark):
    """Every language must come out with exactly the same count (the min
    across languages), and ranks must be 1..quota with no repeats."""
    rows = corpus_mix_equalize(spark, SF_DIR).collect()
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r.lang].append(r.rank_in_lang)
    sizes = {len(v) for v in by_lang.values()}
    assert len(sizes) == 1, f"unbalanced: { {k: len(v) for k, v in by_lang.items()} }"
    quota = sizes.pop()
    for lang, ranks in by_lang.items():
        assert sorted(ranks) == list(range(1, quota + 1)), f"{lang} ranks broken"


def test_pack_offsets_respect_budget_and_chain(spark):
    """pack_offset is always inside the budget, and within a language
    the (pack_id, pack_offset) positions must reconstruct the exact
    running token stream (offset_next == (offset + n_tokens) mod budget
    under the deterministic md5 order)."""
    rows = pack_token_sequences(spark, SF_DIR).collect()
    assert rows
    by_lang = defaultdict(list)
    for r in rows:
        assert 0 <= r.pack_offset < PACK_BUDGET_TOKENS
        by_lang[r.lang].append(r)
    import hashlib

    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id))
        cum = 0
        for r in rs:
            assert r.pack_id == cum // PACK_BUDGET_TOKENS, f"{lang}/{r.doc_id}"
            assert r.pack_offset == cum % PACK_BUDGET_TOKENS
            cum += r.n_tokens


def test_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe candidates are a superset of single-probe's, so for
    every query vector the rank-r multiprobe score must be >= the rank-r
    single-probe score — probing more cells can only improve recall."""
    from flink_kafka_replicator_spark.functions.pipeline_queries import (
        knn_ivf_multiprobe,
    )

    single = defaultdict(dict)
    for r in knn_ivf_join(spark, SF_DIR).collect():
        single[r.vec_id][r.rank] = r.cos_sim
    multi = defaultdict(dict)
    for r in knn_ivf_multiprobe(spark, SF_DIR).collect():
        multi[r.vec_id][r.rank] = r.cos_sim
    assert set(single) <= set(multi), "multiprobe lost query vectors"
    for q, ranks in single.items():
        for rank, s in ranks.items():
            assert multi[q].get(rank, float("-inf")) >= s, (
                f"q {q} rank {rank}: multiprobe {multi[q].get(rank)} < single {s}"
            )


def test_knn_neighbors_stay_in_cell_and_rank_correctly(spark):
    """Per query vector: at most KNN_K neighbors, ranks dense from 1,
    scores non-increasing with rank, and no self-pairs."""
    rows = knn_ivf_join(spark, SF_DIR).collect()
    assert rows
    by_q = defaultdict(list)
    for r in rows:
        assert r.vec_id != r.neighbor_id
        by_q[r.vec_id].append((r.rank, r.cos_sim))
    for q, rs in by_q.items():
        rs.sort()
        assert 1 <= len(rs) <= KNN_K
        assert [r for r, _ in rs] == list(range(1, len(rs) + 1))
        sims = [s for _, s in rs]
        assert all(a >= b for a, b in zip(sims, sims[1:])), f"q {q}: {sims}"


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
            st.integers(0, 2),              # user
            st.integers(0, 2000),           # ts offset seconds (incl 600 boundary)
        ),
        min_size=1,
        max_size=25,
    )
)
def test_sessionize_matches_python_reference(spark, events):
    """Gaps-and-islands vs an independent Python fold, including gap ==
    exactly 600 s (must NOT split — the predicate is strictly greater)
    and duplicate timestamps (tie-broken by event_id)."""
    import datetime as dt

    from flink_kafka_replicator_spark.operators.advanced import sessionize

    base = dt.datetime(2024, 1, 1)
    rows = [
        (u, i, base + dt.timedelta(seconds=s)) for i, (u, s) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = {
        (r.user_id, r.event_id): r.session_seq
        for r in sessionize(df, gap_seconds=600).collect()
    }
    want = {}
    by_user = {}
    for u, i, ts in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        prev = by_user.get(u)
        if prev is None or (ts - prev[0]).total_seconds() > 600:
            seq = (prev[1] if prev else 0) + 1
        else:
            seq = prev[1]
        by_user[u] = (ts, seq)
        want[(u, i)] = seq
    assert got == want


@settings(**_HSET)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 1),              # lang id
            st.integers(0, 1500),           # n_tokens (0, and > budget of 512)
        ),
        min_size=1,
        max_size=20,
    )
)
def test_pack_assign_matches_python_reference(spark, docs):
    """Concat-and-chunk bookkeeping vs an independent Python cumsum,
    including zero-token docs and docs longer than the budget."""
    import hashlib

    from flink_kafka_replicator_spark.functions.corpus import pack_assign

    rows = [(i, f"l{lang}", n) for i, (lang, n) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens int")
    got = {
        r.doc_id: (r.pack_id, r.pack_offset)
        for r in pack_assign(df, budget=512).collect()
    }
    want = {}
    by_lang = {}
    for doc_id, lang, n in sorted(
        rows, key=lambda r: (r[1], hashlib.md5(str(r[0]).encode()).hexdigest(), r[0])
    ):
        cum = by_lang.get(lang, 0)
        want[doc_id] = (cum // 512, cum % 512)
        by_lang[lang] = cum + n
    assert got == want

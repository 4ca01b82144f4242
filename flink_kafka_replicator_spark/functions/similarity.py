"""Similarity search and near-duplicate detection, designed for scale.

Everything avoids the two cardinal sins at 100 TB:
  - no driver-side collect of data-plane rows;
  - no unblocked cross join — every pairwise operator goes through an
    LSH bucket (minhash bands / simhash bands / hyperplane signs) so
    the self-join is an equi-join on the bucket key.

Vector math uses higher-order array functions (zip_with + aggregate)
— JVM-side, codegen-friendly; the fold is left-to-right so results are
deterministic.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

# ---------------------------------------------------------------- vectors

# Fixed 64-dim query vector for similarity-search queries; literal in both
# the Spark plan and any oracle SQL so results are reproducible.
QUERY_VEC: list[float] = [round(math.sin(i + 1.0), 6) for i in range(64)]


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def unrolled_product_sum(a_prefix: str, b_prefix: str, dim: int) -> Column:
    """((0.0 + a1*b1) + a2*b2) + … over per-dimension primitive columns
    ``{a_prefix}1..{dim}`` / ``{b_prefix}1..{dim}`` — bit-identical to
    :func:`dot`'s left-associative fold (and DuckDB's
    list_dot_product; SQL ``+`` parses left-associative), but plain
    codegen'd double arithmetic. Measured ~1.5× faster than the
    aggregate() HOF on the knn pair-scoring path, and ~5× faster than
    unrolled element_at over a transform'd array (which re-materializes
    the cast array per access). Built as ONE parsed expression string —
    a Column-object chain of 64 ops costs ~200 py4j round-trips per
    query build, which dominated the bench. The D suffix keeps the
    seed literal on the DOUBLE path (a bare 0.0 parses as DECIMAL).
    Use when the vector width is statically known and the vectors can
    be projected to columns before the join."""
    terms = "".join(f" + {a_prefix}{i}*{b_prefix}{i}" for i in range(1, dim + 1))
    return F.expr(f"0.0D{terms}")


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def query_vec_col() -> Column:
    return F.array(*[F.lit(v) for v in QUERY_VEC])


# ------------------------------------------------------------- minhash LSH

N_HASHES = 16
N_BANDS = 8  # 8 bands × 2 rows: sensitive enough to surface near-dups
ROWS_PER_BAND = N_HASHES // N_BANDS
SHINGLE_WORDS = 3


def shingles_from_tokens(tokens_col: str, k: int = SHINGLE_WORDS) -> Column:
    """Distinct word k-gram shingles from a *bound tokens column*.

    Must be applied to a materialized column (separate select), not an
    inline split(...): the lambda references the token array per output
    element, and inlining the split would make shingling O(tokens²).

    Degenerate-doc contract: NULL or empty text (split yields NULL or
    [''] — a single empty token) produces ZERO shingles, never the ''
    shingle. Without the guard every empty/NULL doc shares the ''
    shingle and LSH pairs all of them — meaningless candidates that
    exact dedup already covers. Mirrored in every DuckDB oracle's
    shingle CTE (same CASE), pinned by tests/adversarial_sweep.py.
    """
    return F.expr(
        f"CASE WHEN {tokens_col} IS NULL OR size({tokens_col}) = 0"
        f" OR (size({tokens_col}) = 1 AND element_at({tokens_col}, 1) = '')"
        f" THEN array()"
        f" ELSE array_distinct(transform("
        f" sequence(0, greatest(size({tokens_col}) - {k}, 0)),"
        f" i -> concat_ws(' ', slice({tokens_col}, i + 1, {k})))) END"
    )


def word_shingles(text_col: str, k: int = SHINGLE_WORDS) -> Column:
    """Convenience composition for small inputs/tests; production paths
    stage tokens → shingles in separate selects (see shingle_pipeline).
    Same degenerate-doc guard as :func:`shingles_from_tokens`."""
    return F.expr(
        f"CASE WHEN {text_col} IS NULL OR {text_col} = '' THEN array()"
        f" ELSE array_distinct(transform("
        f" sequence(0, greatest(size(split({text_col}, ' ')) - {k}, 0)),"
        f" i -> concat_ws(' ', slice(split({text_col}, ' '), i + 1, {k})))) END"
    )


def shingle_pipeline(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, shingles) with tokens bound once per row."""
    return df.select(id_col, F.split(text_col, " ").alias("__toks")).select(
        id_col, shingles_from_tokens("__toks").alias("shingles")
    )


# Affine permutations mod a Mersenne prime: h_i = (a_i·h + b_i) mod P with
# h = xxhash64(shingle) mod P — ONE string hash per shingle, then cheap
# integer arithmetic per hash function. All intermediates stay < 2^62 so
# this is safe under ANSI overflow checking (Spark 4 default).
_MINHASH_P = (1 << 31) - 1  # Mersenne prime 2^31-1


def _lcg_params(n: int) -> list[tuple[int, int]]:
    state = 0x5DEECE66D
    out = []
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = 1 + (state >> 33) % (_MINHASH_P - 1)
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = (state >> 33) % _MINHASH_P
        out.append((a, b))
    return out


_MINHASH_PARAMS = _lcg_params(N_HASHES)


def _affine_perm(i: int):
    # single-parameter closure: a two-arg lambda would make pyspark's
    # transform() pass the array index as the second argument
    a, b = _MINHASH_PARAMS[i]
    return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MINHASH_P))


# versioned so persisted minhash indexes refuse a mixed-hash append:
# bands built with one hash never equi-join bands built with another,
# which would be SILENT recall loss, not an error
BAND_HASH_VERSION = "md5-32"


def shingle_hashes(shingles: Column) -> Column:
    """One portable 32-bit hash per shingle (md5 head — the same
    cross-engine idiom as :func:`_md5_half`; round 9, formerly
    xxhash64), reduced mod 2^31-1 — which is what lets
    ``dedup_ngram_jaccard``'s UNthresholded candidate set carry a full
    DuckDB oracle that replays the banding bit-exactly."""
    return F.transform(
        shingles, lambda s: F.pmod(_md5_half(s, 1), F.lit(_MINHASH_P))
    )


def minhash_from_hashes(hashes_col: str, n_hashes: int = N_HASHES) -> Column:
    """Signature from a *bound* hash-array column: 16 cheap affine mins.

    Apply in a separate select from shingle_hashes — referencing an
    unbound hash expression here would re-hash every shingle 16 times
    (Catalyst only refrains from inlining when the alias is a bound
    attribute)."""
    h = F.col(hashes_col)
    return F.array(
        *[F.array_min(F.transform(h, _affine_perm(i))) for i in range(n_hashes)]
    )


def minhash_signature(shingles: Column, n_hashes: int = N_HASHES) -> Column:
    """Convenience composition for small inputs/tests; production paths
    stage hashes → signature in separate selects (see banded_minhash)."""
    return F.array(
        *[
            F.array_min(F.transform(shingle_hashes(shingles), _affine_perm(i)))
            for i in range(n_hashes)
        ]
    )


def minhash_signature_table(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, __sig) — the 16-slot minhash signature per row, every stage
    bound to a real column so nothing is recomputed: tokens → shingles
    → hashes → signature, one pass each.

    The signature expression is a single ``F.expr`` SQL string (not a
    Column-API lambda composition) — the py4j round-trips to build 16
    transform lambdas cost more than the banding job itself at small
    SF (see simhash_table for the same pattern). Plans are identical.
    """
    sig_sql = (
        "array("
        + ", ".join(
            f"array_min(transform(__hashes, h -> pmod(h * {a}L + {b}L,"
            f" {_MINHASH_P}L)))"
            for a, b in _MINHASH_PARAMS
        )
        + ")"
    )
    # zero-shingle docs (NULL/empty text) carry NO signature row: the
    # MinHash minimum over the empty set is undefined, and concat_ws in
    # band_keys would otherwise skip the NULL slots and co-bucket every
    # degenerate doc under the same "b:" key
    return (
        shingle_pipeline(df, id_col, text_col)
        .filter(F.size("shingles") > 0)
        .select(id_col, shingle_hashes(F.col("shingles")).alias("__hashes"))
        .select(id_col, F.expr(sig_sql).alias("__sig"))
    )


def banded_minhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, band_key) exploded LSH bucket keys over the signature table
    (see :func:`minhash_signature_table` for the staging discipline)."""
    keys_sql = (
        "array("
        + ", ".join(
            "concat_ws(':', "
            + ", ".join(
                [f"'{b}'"]
                + [
                    f"cast(element_at(__sig, {b * ROWS_PER_BAND + r + 1}) as string)"
                    for r in range(ROWS_PER_BAND)
                ]
            )
            + ")"
            for b in range(N_BANDS)
        )
        + ")"
    )
    return minhash_signature_table(df, id_col, text_col).select(
        id_col, F.explode(F.expr(keys_sql)).alias("band_key")
    )


def band_keys(sig: Column, n_bands: int = N_BANDS, rows: int = ROWS_PER_BAND) -> Column:
    """Array of (band_id, band_hash) strings: the LSH bucket keys."""
    return F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(b)),
                *[
                    F.element_at(sig, b * rows + r + 1).cast("string")
                    for r in range(rows)
                ],
            )
            for b in range(n_bands)
        ]
    )


MAX_BUCKET = 200  # skip pathological mega-buckets (standard LSH hygiene)


def lsh_candidate_pairs(
    df: DataFrame, id_col: str, bucket_col: str = "band_key"
) -> DataFrame:
    """Bucket-local pair generation → distinct candidate pairs (a < b).

    One shuffle (groupBy bucket) + in-bucket pair expansion with
    higher-order functions. Compared to a bucket self-join this evaluates
    the (possibly expensive) upstream signature exactly once, and work
    scales with Σ bucket², never |df|² — the property that makes LSH
    dedup viable at 100 TB. Buckets larger than MAX_BUCKET are dropped:
    they are degenerate shingles (boilerplate), and pair-expanding them
    is quadratic poison at scale.
    """
    ids = F.sort_array(F.collect_list(id_col))
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("ids"), i + 2, F.greatest(F.size("ids") - i - 1, F.lit(0))
                ),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        df.groupBy(bucket_col)
        .agg(ids.alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= MAX_BUCKET))
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )


def lsh_candidate_pairs_payload(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    bucket_col: str = "band_key",
    pair_filter=None,
) -> DataFrame:
    """:func:`lsh_candidate_pairs`, but carrying a small per-id payload
    through the bucket: (id_a, id_b, p_a, p_b).

    When the verification datum is tiny (a simhash signature — 8 bytes),
    collecting it alongside the id beats joining back to the source:
    the upstream signature pipeline is evaluated exactly once instead of
    once per verify side, and the two verify joins vanish from the plan.
    Do NOT use for fat payloads (shingle sets, embeddings) — those stay
    in the source table and join against the broadcast pair list.

    ``pair_filter(df) -> df`` runs on the exploded (id_a, id_b, p_a, p_b)
    rows BEFORE the distinct: when the verification predicate is cheap
    (hamming on the carried payload), filtering first shrinks the
    dedup's shuffle input from |candidates| to |survivors| — on skewed
    bucket distributions that's orders of magnitude.
    """
    items = F.array_sort(
        F.collect_list(
            F.struct(F.col(id_col).alias("id"), F.col(payload_col).alias("p"))
        )
    )
    pairs = F.flatten(
        F.transform(
            F.col("items"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("items"), i + 2, F.greatest(F.size("items") - i - 1, F.lit(0))
                ),
                lambda y: F.struct(
                    x["id"].alias("id_a"),
                    y["id"].alias("id_b"),
                    x["p"].alias("p_a"),
                    y["p"].alias("p_b"),
                ),
            ),
        )
    )
    exploded = (
        df.groupBy(bucket_col)
        .agg(items.alias("items"))
        .filter((F.size("items") >= 2) & (F.size("items") <= MAX_BUCKET))
        .select(F.explode(pairs).alias("q"))
        .select("q.id_a", "q.id_b", "q.p_a", "q.p_b")
    )
    if pair_filter is not None:
        exploded = pair_filter(exploded)
    return exploded.dropDuplicates(["id_a", "id_b"])


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter.cast("double") / union


# ------------------------------------------------------------- simhash

SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # 16 bits per band → catches hamming distance ≤ 3 reliably


def _md5_half(col: Column, start: int) -> Column:
    """Portable 32-bit token hash: 8 hex chars of md5 parsed to a
    bigint — the engine's cross-engine hash idiom (DuckDB twin:
    ``('0x' || substr(md5(x), start, 8))::BIGINT``). Two halves
    (start=1, start=9) give the 64 signature bits."""
    return F.conv(F.substring(F.md5(col), start, 8), 16, 10).cast("bigint")


def simhash(tokens_col: Column) -> Column:
    """64-bit SimHash: fold token hashes into per-bit vote counters with
    zip_with, then reassemble the sign bits into a bigint. Entirely
    JVM-side higher-order functions.

    Token bits come from md5 split into two 32-bit halves (not
    xxhash64): md5 is reproducible in ANSI SQL, which is what lets
    ``dedup_simhash`` carry a full DuckDB oracle instead of a rows-only
    contract. Shift counts must be literals in the DataFrame API, so
    the 64 bit tests are unrolled in Python (over the pre-hashed
    half-pair so md5 runs twice per token, not 64 times)."""
    hashes = F.transform(
        tokens_col, lambda t: F.array(_md5_half(t, 1), _md5_half(t, 9))
    )
    zeros = F.array_repeat(F.lit(0), SIMHASH_BITS)
    bit_votes = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(
                            F.element_at(h, 1 if j < 32 else 2), j % 32
                        ).bitwiseAND(F.lit(1))
                        == 1,
                        F.lit(1),
                    ).otherwise(F.lit(-1))
                    for j in range(SIMHASH_BITS)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    # positive vote → bit j set; 1<<63 wraps to long-min, fine for a hash key
    out = F.lit(0).cast("bigint")
    for j in range(SIMHASH_BITS):
        bit = (1 << j) if j < 63 else -(1 << 63)
        out = out + F.when(
            F.element_at(bit_votes, j + 1) > 0, F.lit(bit).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return out


def simhash_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, sim) 64-bit SimHash signatures via explode + hash-aggregate.

    The scale formulation of :func:`simhash`: explode tokens, hash each
    token ONCE into the two portable md5 halves (see :func:`_md5_half` —
    md5 instead of xxhash64 so the DuckDB oracle can replay signatures
    bit-exactly), then 64 codegen'd conditional SUMs (one per bit)
    in a single hash aggregate. Map-side partial aggregation collapses
    a doc's tokens to one row before the (id-keyed) shuffle, and the
    whole pipeline stays in whole-stage codegen — unlike the nested
    higher-order-function version, which Spark interprets row-at-a-time
    (measured 2.7× slower at sf0.01). Bit-identical to :func:`simhash`.

    The 64 per-bit counters are packed 4-to-a-long in 16-bit lanes (16
    SUM buffers instead of 64 — measured another 40% off warm time and
    4× off the codegen compile). Lane arithmetic bounds the per-doc
    token count at 2^15 (top lane sum must stay under 2^63); split
    oversized docs upstream if that ever binds.

    Both big expression trees are assembled as SQL strings for a single
    ``F.expr`` parse each — building them from hundreds of Column calls
    costs ~1.6 s of py4j round-trips per query *construction* (measured;
    the JVM plan is identical either way).

    Entry fans out single-split scans (io.fan_out_small_scan): the
    per-token md5 work is invisible to byte-sized split planning; a
    no-op at production scale and on streaming frames.
    """
    from ..io import fan_out_small_scan

    df = fan_out_small_scan(df)
    toks = df.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("__tok"))
    h = toks.select(
        id_col,
        F.expr(
            "cast(conv(substring(md5(__tok), 1, 8), 16, 10) as bigint)"
        ).alias("__hl"),
        F.expr(
            "cast(conv(substring(md5(__tok), 9, 8), 16, 10) as bigint)"
        ).alias("__hh"),
    )

    def _bit(j: int) -> str:
        half, shift = ("__hl", j) if j < 32 else ("__hh", j - 32)
        return f"(shiftright({half}, {shift}) & 1)"

    lanes_per_long, lane_bits = 4, 16
    n_groups = SIMHASH_BITS // lanes_per_long
    packed_sums = [
        F.expr(
            "sum("
            + " + ".join(
                f"{_bit(g * lanes_per_long + k)} * {1 << (lane_bits * k)}L"
                for k in range(lanes_per_long)
            )
            + ")"
        ).alias(f"__p{g}")
        for g in range(n_groups)
    ]
    votes = h.groupBy(id_col).agg(F.count("*").alias("__n"), *packed_sums)
    lane_mask = (1 << lane_bits) - 1
    terms = []
    for j in range(SIMHASH_BITS):
        g, k = divmod(j, lanes_per_long)
        # -(1<<63) can't be written as a single SQL literal (parses as
        # unary minus of an overflowing positive); spell it as arithmetic
        bit = f"{1 << j}L" if j < 63 else "(-9223372036854775807L - 1L)"
        terms.append(
            f"if(((shiftright(__p{g}, {lane_bits * k}) & {lane_mask}) * 2) > __n,"
            f" {bit}, 0L)"
        )
    sim = F.expr("CAST(" + " + ".join(terms) + " AS BIGINT)")
    return votes.select(id_col, sim.alias("sim"))


def simhash_bands(sim_col: Column) -> Column:
    """Split the 64-bit simhash into 4 × 16-bit band keys."""
    mask = F.lit((1 << 16) - 1).cast("bigint")
    return F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(b)),
                F.shiftrightunsigned(sim_col, b * 16).bitwiseAND(mask).cast("string"),
            )
            for b in range(SIMHASH_BANDS)
        ]
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


# --------------------------------------------- random-hyperplane LSH (vectors)

N_PLANES = 8


def _hyperplanes(dims: int = 64, n_planes: int = N_PLANES) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixed LCG, no numpy import
    cost at module load; literal in the plan)."""
    state = 42
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dims):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(round(((state >> 11) / float(1 << 53)) * 2.0 - 1.0, 6))
        planes.append(row)
    return planes


HYPERPLANES = _hyperplanes()


def hyperplane_bucket(vec: Column) -> Column:
    """Sign-bit bucket id from N_PLANES random hyperplanes."""
    bucket = F.lit(0)
    for j, plane in enumerate(HYPERPLANES):
        p = F.array(*[F.lit(v) for v in plane])
        bucket = bucket + F.when(dot(vec, p) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket

"""Text-analysis functions for training-data pipelines.

Tokenization, language-ID (stopword-profile heuristic), quality
scoring, BPE-ish token counting, and rolling-hash document
fingerprinting — all as JVM-side column expressions so they run inside
whole-stage codegen at 100 TB (no Python in the row path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword profiles for the n-gram/stopword language-ID heuristic.
# Priority order breaks ties deterministically.
LANG_PROFILES: list[tuple[str, list[str]]] = [
    ("en", ["the", "and", "of", "is", "a"]),
    ("es", ["el", "la", "de", "que", "y"]),
    ("fr", ["le", "la", "et", "les", "des"]),
    ("de", ["der", "die", "und", "das", "ist"]),
    ("zh", ["de", "shi", "le", "zai", "he"]),
]

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

# BPE-ish pre-tokenizer: letter runs, digit runs, single other symbols.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization."""
    return F.split(F.col(col) if isinstance(col, str) else col, " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_token_count(text_col: str) -> Column:
    """Count of BPE-style pre-tokens via a single regex scan."""
    return F.size(F.expr(f"regexp_extract_all({text_col}, '{BPE_PATTERN}', 0)"))


def stopword_ratio(col: Column | str) -> Column:
    toks = tokens(col)
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return n_stop.cast("double") / F.size(toks)


def distinct_token_ratio(col: Column | str) -> Column:
    toks = tokens(col)
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks)


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0, ~1]: stopword presence signals
    natural language; distinct-token ratio penalizes boilerplate."""
    return 0.5 * stopword_ratio(col) + 0.5 * distinct_token_ratio(col)


def lang_scores(col: Column | str) -> dict[str, Column]:
    toks = tokens(col)
    out = {}
    for lang, profile in LANG_PROFILES:
        prof = F.array(*[F.lit(w) for w in profile])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(prof, t)))
    return out


def predicted_lang(col: Column | str) -> Column:
    """Argmax over profile scores; earlier profile wins ties."""
    scores = lang_scores(col)
    langs = [lang for lang, _ in LANG_PROFILES]
    expr = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        cond = None
        for other in langs:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def rolling_fingerprint(text_col: str, k: int = 5) -> Column:
    """Rolling-window document fingerprint: the minimum md5 over all
    character k-grams (a 1-sketch winnowing fingerprint). Pure SQL
    expressions → codegen; no UDF. Degenerate docs (NULL/empty text)
    have no k-grams and fingerprint NULL — the unguarded floor would
    manufacture a '' gram (md5('') for every empty doc)."""
    return F.expr(
        f"CASE WHEN {text_col} IS NULL OR {text_col} = '' THEN NULL"
        f" ELSE array_min(transform("
        f" sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> md5(substring({text_col}, i, {k})))) END"
    )


def distinct_kgram_count(text_col: str, k: int = 5) -> Column:
    """Distinct char-k-gram count; 0 for NULL/empty text (same
    degenerate-doc contract as :func:`rolling_fingerprint`)."""
    return F.expr(
        f"CASE WHEN {text_col} IS NULL OR {text_col} = '' THEN 0"
        f" ELSE size(array_distinct(transform("
        f" sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> substring({text_col}, i, {k})))) END"
    )

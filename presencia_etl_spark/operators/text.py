"""Text analysis operators for training-data pipelines (100 TB extensions).

All JVM-side (split / filter / transform / aggregate higher-order
functions) — no Python on the hot path, so throughput scales with cores.

- token counting (whitespace + a BPE-ish regex variant)
- quality scoring (length / punctuation / stopword ratios)
- language ID (marker-token n-gram heuristic, deterministic)
- document fingerprinting (md5 head fingerprint + Rabin-Karp-style
  winnowed rolling-hash shingle fingerprints)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from presencia_etl_spark.functions.partitioning import parallelize_scan

# A BPE-ish pre-tokenization split: word pieces, numbers, punctuation runs.
BPE_SPLIT_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

DEFAULT_STOPWORDS = ("the", "a", "of", "and", "to", "in")

# Marker vocabularies for the n-gram language heuristic. Deterministic and
# tiny — a real deployment would swap in per-language frequency tables.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
}


def tokens(col: Column | str, pattern: str = r"\s+") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, pattern)


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    """Count of BPE-ish pieces via regexp_extract_all."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_REGEX), 0))


def stopword_count(col: Column | str, stopwords=DEFAULT_STOPWORDS) -> Column:
    toks = tokens(col)
    cond = " or ".join(f"x = '{w}'" for w in stopwords)
    return F.expr(f"size(filter(split({col}, '\\\\s+'), x -> {cond}))") if isinstance(col, str) else F.size(
        F.filter(toks, lambda x: x.isin(*stopwords))
    )


def punct_ratio(col: Column | str, punct_class: str = r"[.,;:!?'\"()\[\]]") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, punct_class, "")
    return (F.length(c) - F.length(stripped)).cast("double") / F.greatest(
        F.length(c).cast("double"), F.lit(1.0)
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach n_tokens / avg_token_len / stopword_ratio / punct_ratio /
    quality_score. One projection, no shuffle (beyond the scan-width
    repair for single-file corpora — the tokenize-and-filter chain is the
    expensive part and must not run on one task)."""
    df = parallelize_scan(df)
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("double")
    out = df.withColumn("n_tokens", F.size(tokens(text_col)))
    out = out.withColumn(
        "avg_token_len",
        F.round(F.length(F.col(text_col)).cast("double") / F.greatest(n_tok, F.lit(1.0)), 4),
    )
    out = out.withColumn(
        "stopword_ratio",
        F.round(
            F.size(F.filter(tokens(text_col), lambda x: x.isin(*DEFAULT_STOPWORDS))).cast("double")
            / F.greatest(n_tok, F.lit(1.0)),
            4,
        ),
    )
    out = out.withColumn("punct_ratio", F.round(punct_ratio(text_col), 4))
    # Simple monotone quality heuristic: long-enough docs with normal token
    # length and some stopwords score higher; punctuation-dominated text
    # (markup soup, ascii art) is pushed toward 0 — without the penalty a
    # three-"token" run of pure punctuation lands mid-scale because its
    # token length looks wordlike.
    score = (
        F.least(F.col("n_tokens").cast("double") / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.when((F.col("avg_token_len") >= 3) & (F.col("avg_token_len") <= 10), 0.3).otherwise(0.0)
        + F.least(F.col("stopword_ratio") * F.lit(3.0), F.lit(0.3))
        - F.least(F.col("punct_ratio") * F.lit(1.5), F.lit(1.0))
    )
    return out.withColumn(
        "quality_score", F.round(F.greatest(score, F.lit(0.0)), 4)
    )


def _in_set(words: tuple[str, ...]):
    # One-arg closure: F.filter inspects lambda arity, so a second default
    # arg would be bound to the element-index Column.
    return lambda x: x.isin(*words)


def lang_scores(col: Column | str, markers: dict[str, tuple[str, ...]] = LANG_MARKERS) -> dict[str, Column]:
    toks = tokens(col)
    return {
        lang: F.size(F.filter(toks, _in_set(ws))) for lang, ws in markers.items()
    }


def predict_lang(col: Column | str, markers: dict[str, tuple[str, ...]] = LANG_MARKERS) -> Column:
    """Deterministic argmax over marker-token scores; ties broken by
    language-code order; zero evidence → 'und'."""
    scores = lang_scores(col, markers)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(scores):  # later wins only on strictly greater
        s = scores[lang]
        improved = s > best_score
        best_lang = F.when(improved, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(improved, s).otherwise(best_score)
    return best_lang


# PII patterns for training-corpus scrubbing. Order matters: the email
# rule must run before the phone rule (digits inside a mailto-ish string).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b(?:\+?\d{1,3}[-. ]?)?(?:\(\d{2,4}\)[-. ]?)?\d{3,4}[-. ]\d{3,4}\b", "<PHONE>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
)


def redact_pii(
    col: Column | str, patterns: tuple[tuple[str, str], ...] = PII_PATTERNS
) -> Column:
    """Replace PII-shaped substrings with typed placeholder tokens — the
    standard scrub pass before a corpus feeds training. A chain of JVM
    ``regexp_replace`` calls: no UDF, scales linearly with cores, and the
    placeholders keep token positions meaningful for downstream stats."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, token in patterns:
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_counts(col: Column | str, patterns: tuple[tuple[str, str], ...] = PII_PATTERNS) -> Column:
    """Struct of per-type PII hit counts (audit/reporting side of the
    scrub; e.g. filter docs whose counts exceed a threshold)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(
        *[
            F.size(F.regexp_extract_all(c, F.lit(p), F.lit(0))).alias(
                t.strip("<>").lower()
            )
            for p, t in patterns
        ]
    )


def md5_fingerprint(col: Column | str, head: int = 40) -> Column:
    """Cheap doc fingerprint: md5(length-tagged head of the text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat_ws("|", F.length(c).cast("string"), F.substring(c, 1, head)))


def winnowed_fingerprints(text_col: str, k: int = 8, window: int = 4) -> Column:
    """Winnowing (Schleimer et al.): rolling k-char hashes, min per sliding
    window, distinct — a compact, shift-tolerant fingerprint set.
    Entirely in one SQL expression (no UDF).

    The gram-hash array is materialized ONCE by binding it as the element
    of a single-element outer ``transform`` (the lambda variable ``g`` is a
    value, not an expression) — inlining it textually into the sliding-
    window lambda would re-hash the whole document per window position
    (quadratic; measured 57 s for 50 docs before this fix).
    """
    grams = (
        f"transform(sequence(1, greatest(length({text_col}) - {k} + 1, 1)),"
        f" i -> xxhash64(substring({text_col}, i, {k})))"
    )
    return F.expr(
        f"transform(array({grams}), g -> "
        f"array_distinct(transform(sequence(1, greatest(size(g) - {window} + 1, 1)),"
        f" j -> array_min(slice(g, j, {window})))))[0]"
    )


# NOTE: an Arrow-hybrid winnowing variant (JVM gram hashing + numpy
# sliding-window min) was prototyped and REMOVED: measured slower than
# this SQL fold at sf0.1 short docs (5.8 s vs 3.6 s) AND on 24k-char docs
# (38 s vs 19 s) — the gram-array Arrow transfer dominates at every
# realistic document length. Unlike the simhash/minhash hybrids (whose
# per-token work is n_families×|tokens|), winnowing does O(window) work
# per gram, too little to amortize serialization.

"""Text-analysis operators over a document text column — all JVM-side
built-ins (whole-stage codegen), no Python on the hot path.

Implements, as Spark column expressions:
- quality scoring (the reference formula, quality_evaluator.py:46-126)
- language ID (n-gram/stopword heuristic — training-data pipeline op)
- token counting (regex word model)
- document fingerprinting (polynomial rolling hash over token lengths)

Each has an ANSI-SQL twin in `__spark_entry__.oracle_sql()` for the DuckDB
cross-check; the repeat-penalty term uses a Java-regex backreference that
RE2/DuckDB cannot express, so the SQL-checked quality query omits it on BOTH
sides and the full formula is pytest-verified against the oracle instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUALITY_SPECIAL_CHAR_THRESHOLD = 0.05  # reference config.py:30-34
QUALITY_SHORT_WORD_THRESHOLD = 0.3


def _nonblank_lines(t: Column) -> Column:
    return F.size(F.filter(F.split(t, "\n"), lambda x: F.trim(x) != ""))


def quality_columns(t: Column, include_repeat_penalty: bool = True) -> dict[str, Column]:
    """The reference text-quality formula as pure column expressions.
    Returns the component columns; caller selects/aliases."""
    t = F.trim(t)
    empty = (t.isNull()) | (F.length(t) == 0)
    length_score = F.least(F.length(t) / 1000.0, F.lit(10.0)) * 10.0
    headers = F.regexp_count(t, F.lit(r"(?m)^#+\s"))
    lists_ = F.regexp_count(t, F.lit(r"(?m)^[-*•]\s|^\d+\.\s"))
    paras = F.regexp_count(t, F.lit(r"\n\s*\n")) + 1
    nonblank = _nonblank_lines(t)
    structure_score = F.least(
        F.least(headers * 5.0, F.lit(30.0))
        + F.least(lists_ * 2.0, F.lit(20.0))
        + F.least(paras * 1.0, F.lit(20.0))
        + F.least(nonblank * 0.5, F.lit(30.0)),
        F.lit(100.0),
    )
    uniq = F.size(
        F.array_distinct(F.split(F.translate(F.lower(t), " \n", ""), ""))
    )
    diversity_score = F.least(uniq * 2.0, F.lit(100.0))

    special_ratio = F.regexp_count(
        t, F.lit(r'[^\w\s\n.,!?;:()\[\]{}""' "-]")
    ) / F.length(t)
    words = F.regexp_count(t, F.lit(r"\b\w+\b"))
    short_words = F.regexp_count(t, F.lit(r"\b\w\b"))
    short_ratio = F.when(words > 0, short_words / words).otherwise(F.lit(0.0))

    penalty = F.lit(1.0)
    if include_repeat_penalty:  # Java-regex backreference; no RE2 equivalent
        penalty = penalty * F.when(
            F.regexp_count(t, F.lit(r"(.)\1{4,}")) > 0, F.lit(0.8)
        ).otherwise(F.lit(1.0))
    penalty = penalty * F.when(
        special_ratio > QUALITY_SPECIAL_CHAR_THRESHOLD, F.lit(0.9)
    ).otherwise(F.lit(1.0))
    penalty = penalty * F.when(
        short_ratio > QUALITY_SHORT_WORD_THRESHOLD, F.lit(0.7)
    ).otherwise(F.lit(1.0))

    total = (
        length_score * 0.3 + structure_score * 0.4 + diversity_score * 0.3
    ) * penalty
    z = F.lit(0.0)
    return {
        "length_score": F.when(empty, z).otherwise(length_score),
        "structure_score": F.when(empty, z).otherwise(structure_score),
        "diversity_score": F.when(empty, z).otherwise(diversity_score),
        "error_penalty": F.when(empty, F.lit(1.0)).otherwise(penalty),
        "total_score": F.when(empty, z).otherwise(total),
    }


def with_quality(df: DataFrame, text_col: str = "text",
                 include_repeat_penalty: bool = True) -> DataFrame:
    cols = quality_columns(F.col(text_col), include_repeat_penalty)
    for name, c in cols.items():
        df = df.withColumn(name, c)
    return df


def lang_id(t: Column) -> Column:
    """Heuristic language ID: CJK-codepoint presence, then stopword hits.
    Deliberately simple and SQL-twinnable (training-data pipeline op)."""
    cjk = F.regexp_count(t, F.lit(r"[一-鿿]"))
    en_stop = F.regexp_count(F.lower(t), F.lit(r"\b(the|and|of|to|in)\b"))
    return (
        F.when(cjk > 0, F.lit("zh"))
        .when(en_stop >= 3, F.lit("en"))
        .otherwise(F.lit("other"))
    )


def token_count(t: Column) -> Column:
    """Word-regex token model (`\\w+`) — the simple whitespace-ish counter."""
    return F.regexp_count(t, F.lit(r"\w+"))


# GPT-2-style pretokenizer shape (public: contractions, letter runs, number
# runs, punctuation runs, whitespace runs) restricted to RE2-compatible
# syntax so the DuckDB oracle computes the identical count.
BPE_PRETOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_pretoken_count(t: Column) -> Column:
    """BPE-ish pretoken count: how many pieces a GPT-2-style pretokenizer
    would hand to the merge table — the training-data token estimator."""
    return F.regexp_count(t, F.lit(BPE_PRETOKEN_PATTERN))


def fingerprint(t: Column) -> Column:
    """Polynomial rolling hash over token lengths, mod 1e9+7 — a cheap,
    order-sensitive document fingerprint expressible in both engines."""
    tokens = F.split(F.trim(t), r"\s+")
    lens = F.transform(tokens, lambda x: F.length(x).cast("long"))
    return F.aggregate(
        lens, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + x) % 1000000007
    )


def method_selection(md_score: Column, ocr_score: Column) -> Column:
    """T11 — weighted-score method choice (quality_evaluator.py:220-231)."""
    return F.when(md_score > ocr_score, F.lit("markitdown")).otherwise(F.lit("ocr"))

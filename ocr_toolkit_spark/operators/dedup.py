"""Deduplication operators for large-scale training-data pipelines.

All scale paths are shuffle-aware DataFrame compositions:

- exact: hash-groupBy on md5(text) — one shuffle, map-side partial agg.
- normalized: same after canonical text normalization (casefold, strip
  punctuation, collapse whitespace).
- MinHash + LSH: shingle → per-seed min of xxhash64 → band buckets →
  self-join on (band, band_hash) → verified Jaccard. The self-join is on
  bucket keys, never all-pairs; band count trades recall vs join fan-out.
- SimHash: 64-bit signature via a vectorized Arrow-batched pandas UDF
  (NumPy bit ops — the per-bit aggregate is not efficiently expressible in
  column algebra); near-dups = identical signatures or Hamming ≤ r by
  bucketed join on signature chunks.
- n-gram Jaccard verification for candidate pairs via array_intersect /
  array_union sizes (JVM-side).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# --- exact / normalized ------------------------------------------------------


def exact_dedup_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row summary: total docs, distinct texts, duplicate docs."""
    h = F.md5(F.col(text_col))
    return df.select(h.alias("h")).agg(
        F.count("*").alias("total_docs"),
        F.countDistinct("h").alias("distinct_texts"),
        (F.count("*") - F.countDistinct("h")).alias("duplicate_docs"),
    )


def normalize_text(t: Column) -> Column:
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(t), r"[^a-z0-9一-鿿]+", " "),
            r"\s+",
            " ",
        )
    )


def exact_dedup_keep_first(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Representative-per-group dedup: keep min(id) per exact text hash.
    min_by avoids a window sort — single hash aggregation."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("h"))
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("group_size"))
        .drop("h")
    )


# --- shingles / MinHash LSH ---------------------------------------------------


def shingles(t: Column, k: int = 5) -> Column:
    """Word k-shingles as an array column (JVM-side; deduplicated)."""
    tokens = F.split(F.trim(F.lower(t)), r"\s+")
    n = F.size(tokens)
    return F.when(n >= k, F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, k)),
        )
    )).otherwise(F.array(F.concat_ws(" ", tokens)))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 64,
) -> DataFrame:
    """(id, sig array<long>) via explode + hash aggregation.

    Shape matters at scale: computing the signature as n_hashes nested
    `array_min(transform(...))` expressions re-evaluates the shingle array
    per seed (Catalyst does not CSE across lambda boundaries) — measured
    pathological. Instead: explode shingles (map-side, no shuffle), compute
    the n seed-hashes per shingle ONCE each, then one hash aggregation of
    per-seed minima with map-side partial aggregation."""
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), k)).alias("sh"),
    )
    mins = [
        F.min(F.xxhash64("sh", F.lit(seed))).alias(f"h{seed}")
        for seed in range(n_hashes)
    ]
    agg = ex.groupBy("id").agg(*mins)
    return agg.select(
        "id", F.array(*[f"h{s}" for s in range(n_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from banded MinHash buckets.
    One shuffle to bucket (explode bands → join), never O(n²)."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, k, n_hashes)
    banded = sig.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",", F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    candidates: DataFrame,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only (array set algebra)."""
    sh = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), k).alias("sh")
    )
    j = (
        candidates.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


# --- SimHash -------------------------------------------------------------------


@pandas_udf(T.LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over word tokens — Arrow-batched NumPy bit ops.

    Per doc: hash each token to 64 bits; signature bit i = sign of
    sum over tokens of (bit_i ? +1 : -1).
    """
    out = np.zeros(len(texts), dtype=np.int64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = pd.util.hash_array(
            pd.Series(str(t).lower().split(), dtype=object).to_numpy()
        ).astype(np.uint64)
        if len(toks) == 0:
            continue
        bits = (toks[:, None] >> bit_idx[None, :]) & np.uint64(1)
        votes = bits.astype(np.int64) * 2 - 1
        sig_bits = (votes.sum(axis=0) > 0).astype(np.uint64)
        out[i] = (sig_bits << bit_idx).sum().astype(np.int64)
    return pd.Series(out)


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs with Hamming(sig) ≤ max_hamming.

    Scale path: pigeonhole — split the 64-bit signature into `chunks` pieces;
    any pair within distance < chunks must share at least one exact piece, so
    candidates come from equi-joins on (chunk_idx, chunk_value), then exact
    Hamming verification via bit_count(xor). Requires max_hamming < chunks.
    """
    sig = df.select(
        F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sig")
    )
    width = 64 // chunks
    pieces = sig.select(
        "id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    (
                        F.shiftrightunsigned("sig", i * width)
                        % F.lit(2**width)
                    ).alias(f"c{i}")
                    for i in range(chunks)
                ]
            )
        ).alias("chunk", "val"),
    )
    a, b = pieces.alias("a"), pieces.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )

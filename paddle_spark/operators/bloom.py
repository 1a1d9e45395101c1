"""Bloom-filter corpus membership — incremental-crawl dedup at scale.

The canonical 100-TB problem: a fresh crawl must drop documents already
present in the previous snapshot WITHOUT shuffling the old corpus
against the new one. The Bloom filter is the classic answer: build a
fixed-size bitset over the old corpus once, broadcast it (kilobytes to
megabytes, independent of corpus size), and gate the new corpus with a
map-side test. False positives drop a few fresh documents (tunable via
m/k); false negatives are impossible, so nothing duplicate survives.

Spark-shaped build and probe, no driver bitset and no Python in the
hot path:

- build: k = ``n_hashes`` positions per key via seeded ``xxhash64``,
  ``explode`` -> per-64-bit-word ``bit_or`` aggregate. The result is a
  DataFrame of (word_idx, word) with at most m/64 rows — the bitset
  stays distributed until the join.
- probe: the new corpus joins the bitset k times (broadcast hash join
  on each position's word index — map-only, zero shuffles) and a row is
  "present" iff all k probed bits are set.

Sizing: FP rate ~= (1 - e^(-k n / m))^k; m = 2^22 bits (64 K words,
512 KiB broadcast) holds 10^6 keys at k=5 under 1 % FP. At 10^12 keys
use a partitioned family of filters (one per key-range) — same plan
shape, the bitset join key gains a range column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 18
DEFAULT_K = 5


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions in [0, m_bits) via seeded xxhash64 (pmod keeps
    negatives out)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)).cast("long")
        for i in range(k)
    ]


def _bit_mask(p: Column) -> Column:
    """1L << (p % 64) with a Column shift count (the SQL shiftleft
    accepts expressions for both operands; the Python wrapper does not,
    hence call_function)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
    )


def bloom_build(
    df: DataFrame,
    key_col: str = "text",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Bitset DataFrame (word_idx:long, word:long) over df[key_col].

    One explode + one hash aggregate; the aggregate output is at most
    m_bits/64 rows regardless of corpus size (map-side partial bit_or
    keeps the shuffle tiny)."""
    pos = F.array(*_positions(F.col(key_col), m_bits, k))
    return (
        df.select(F.explode(pos).alias("p"))
        .select(
            (F.col("p") / 64).cast("long").alias("word_idx"),
            _bit_mask(F.col("p")).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str = "text",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """df + boolean ``in_bloom``: true iff every one of the k probed
    bits is set in the bitset.

    k broadcast hash joins (the bitset is <= m_bits/64 rows), each on a
    distinct derived word-index column — map-only, no shuffle of df.
    A missing word_idx row means an all-zero word -> bit unset."""
    out = df
    probe_cols = []
    for i, p in enumerate(_positions(F.col(key_col), m_bits, k)):
        wi = f"_bl_wi{i}"
        hit = f"_bl_hit{i}"
        out = out.withColumn(wi, (p / 64).cast("long")).withColumn(
            f"_bl_mask{i}", _bit_mask(p)
        )
        b = bloom.select(
            F.col("word_idx").alias(wi), F.col("word").alias(f"_bl_w{i}")
        )
        out = out.join(F.broadcast(b), wi, "left").withColumn(
            hit,
            F.coalesce(
                (F.col(f"_bl_w{i}").bitwiseAND(F.col(f"_bl_mask{i}")) != 0),
                F.lit(False),
            ),
        )
        probe_cols.append(hit)
    all_hit = F.col(probe_cols[0])
    for h in probe_cols[1:]:
        all_hit = all_hit & F.col(h)
    drop = [c for c in out.columns if c.startswith("_bl_")]
    return out.withColumn("in_bloom", all_hit).drop(*drop)


def bloom_filter_new(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str = "text",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Rows of df whose key is (probably) NOT in the built corpus —
    the incremental-crawl survivor set. No false negatives: a row
    identical to a built key can never survive."""
    return (
        bloom_probe(df, bloom, key_col, m_bits, k)
        .filter(~F.col("in_bloom"))
        .drop("in_bloom")
    )

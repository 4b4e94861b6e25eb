"""SimHash near-duplicate detection.

64-bit SimHash: per-token xxhash64, bitwise weighted majority vote.  The
bit-vote is expressed with ``F.aggregate`` over the token-hash array (one
pass, codegen).  Candidate generation: split the 64-bit signature into
``bands`` chunks — by pigeonhole, two docs within hamming distance
``bands − 1`` share ≥1 exact chunk, so the bucket join finds all pairs
within that radius; a final hamming filter verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arcadedb_spark.text.fulltext import tokenize


def simhash(text_col) -> F.Column:
    """64-bit SimHash of the token multiset (returns long).

    NOTE: this inline form re-tokenizes per bit-vote aggregate; prefer
    ``simhash_from_hashes`` over a materialized token-hash column in hot
    paths (64× tokenizer fan-out otherwise)."""
    hashes = F.transform(tokenize(text_col), lambda t: F.xxhash64(t))
    return simhash_from_hashes(hashes)


def simhash_from_hashes(hashes) -> F.Column:
    """SimHash from a token-hash array column (materialize the array via
    withColumn first so the 64 per-bit aggregates read an attribute, not a
    re-evaluated expression)."""
    # vote per bit: +1 if set, −1 if not; bit in result = vote > 0
    def _vote(mask):
        # closure factory keeps the merge lambda binary (pyspark arity)
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(mask) != 0, 1
        ).otherwise(-1)

    bit_cols = []
    for bit in range(64):
        # bit 63 must be the negative two's-complement value to fit a long
        mask_val = (1 << bit) if bit < 63 else -(1 << 63)
        mask = F.lit(mask_val).cast("long")
        votes = F.aggregate(hashes, F.lit(0), _vote(mask))
        bit_cols.append(F.when(votes > 0, mask).otherwise(F.lit(0).cast("long")))
    sig = bit_cols[0]
    for b in bit_cols[1:]:
        sig = sig.bitwiseOR(b)
    return sig


def hamming64(a, b) -> F.Column:
    return F.bit_count(
        (F.col(a) if isinstance(a, str) else a).bitwiseXOR(
            F.col(b) if isinstance(b, str) else b
        )
    )


def simhash_duplicate_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Pairs (id_a < id_b) with simhash hamming distance ≤ max_hamming.

    bands must be > max_hamming for exact recall (pigeonhole).
    """
    assert bands > max_hamming, "need bands > max_hamming for full recall"
    bits_per = 64 // bands
    from arcadedb_spark.parallel import ensure_min_partitions

    src = ensure_min_partitions(docs.select(id_col, text_col))
    sigs = src.select(
        F.col(id_col).alias("id"),
        F.transform(tokenize(text_col), lambda t: F.xxhash64(t)).alias("__h"),
    ).select("id", simhash_from_hashes(F.col("__h")).alias("sig")).cache()
    chunks = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sig", b * bits_per)
                        .bitwiseAND(F.lit((1 << bits_per) - 1).cast("long"))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.chunk")
    l, r = chunks.alias("l"), chunks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sig").alias("__sa"),
            F.col("r.sig").alias("__sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", hamming64("__sa", "__sb"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )

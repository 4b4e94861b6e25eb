"""MinHash + LSH near-duplicate detection.

Pipeline (shingle → minhash → band → bucket-join → verify), the standard
large-corpus shape:

1. k-token shingles, hashed with xxhash64 (codegen).
2. ``num_hashes`` minhash values via the (a·x + b) mod p permutation
   family — computed per row with ``F.transform``/``array_min`` over the
   shingle-hash array; no Python.
3. Signatures split into bands; docs sharing a band bucket are candidates
   (equi-join on (band, band_hash) — shuffle bounded by bucket sizes).
4. Candidate pairs verified by estimated Jaccard = matching minhashes /
   num_hashes; pairs ≥ threshold survive.

Determinism: fixed seeds so the oracle can re-derive identical pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arcadedb_spark.caching import bounded_cache
from arcadedb_spark.parallel import ensure_min_partitions

# 31-bit Mersenne prime: keeps a·x+b < 2^62 (no long overflow in codegen)
_MERSENNE = (1 << 31) - 1


def _shingle_hashes(text_col, shingle_size: int) -> F.Column:
    """Non-negative 61-bit shingle-hash set (zip-of-slices shape — no
    outer-ref inside the lambda; see ngram.ngram_hashes)."""
    from arcadedb_spark.dedup.ngram import ngram_hashes

    return F.transform(
        ngram_hashes(text_col, shingle_size), lambda h: F.pmod(h, F.lit(_MERSENNE))
    )


def _hash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
        for _ in range(num_hashes)
    ]


def _signatures_from_sets(
    sets: DataFrame, num_hashes: int, seed: int
) -> DataFrame:
    """(id, sig) from a materialized (id, grams) frame.

    Shape: all ``num_hashes`` permutation minima are computed per ROW
    with ``array_min(transform(...))`` over the materialized shingle
    array — embarrassingly parallel, NO explode and NO shuffle (the
    previous explode→groupBy form shuffled one row per (doc, shingle)
    just to take 32 minima the row already had locally; same arithmetic,
    measured ~15% faster at sf0.1 and one full exchange cheaper at any
    scale).  Docs whose gram array is null (null text) produce no
    signature, matching the explode form's behavior."""
    params = _hash_params(num_hashes, seed)

    def _perm(a, b):
        # closure factory keeps the pyspark lambda unary
        return lambda h: F.pmod(
            a * F.pmod(h, F.lit(_MERSENNE)) + b, F.lit(_MERSENNE)
        )

    sig_cols = [
        F.array_min(F.transform("grams", _perm(a, b))).alias(f"__m{i}")
        for i, (a, b) in enumerate(params)
    ]
    return (
        sets.where(F.col("grams").isNotNull())
        .select("id", *sig_cols)
        .select(
            "id",
            F.array(*[F.col(f"__m{i}") for i in range(num_hashes)]).alias("sig"),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_size: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>[num_hashes]).

    The shingle-hash arrays are materialized (cached) before the explode:
    Generate inlines its child expression and evaluates it interpreted
    without subexpression elimination, so exploding the raw shingle
    expression would re-tokenize each doc many times over (see
    ngram.ngram_jaccard_pairs).
    """
    from arcadedb_spark.dedup.ngram import ngram_sets

    src = ensure_min_partitions(docs.select(id_col, text_col))
    sets = bounded_cache(ngram_sets(src, id_col, text_col, shingle_size))
    return _signatures_from_sets(sets, num_hashes, seed)


def minhash_duplicate_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_size: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
    verify: str = "estimate",
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, est_jaccard ≥ threshold).

    ``verify="exact"`` re-verifies LSH candidates with the TRUE Jaccard
    over the distinct shingle sets (one candidate-bounded array join) and
    returns (id_a, id_b, jaccard) — the production dedup shape (LSH only
    generates candidates; the decision is exact) and the driver-oracle
    shape (true Jaccard is re-derivable in DuckDB; minhash estimates are
    not)."""
    from arcadedb_spark.dedup.ngram import ngram_sets

    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    # ONE tokenize+shingle pass serves the whole pipeline: signatures,
    # banding, and the exact-verify gram arrays all derive from this
    # cached (id, grams) frame — the previous shape re-tokenized the
    # corpus three times (signature build + one per verify join side).
    src = ensure_min_partitions(docs.select(id_col, text_col))
    sets = bounded_cache(ngram_sets(src, id_col, text_col, shingle_size))
    # sigs is read twice on EVERY path — the band self-join probes it for
    # its left side and builds its right side from it — and the 32
    # permutation-minima transforms are the pipeline's dominant per-row
    # compute, so materialize it once (the cached rows are just
    # (id, 32×long), far narrower than the shingle arrays).  Without this
    # the exact path re-ran the full signature projection per join side
    # (plan-verified: two identical 32×array_min Projects over the sets
    # cache).
    sigs = bounded_cache(_signatures_from_sets(sets, num_hashes, seed))
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bh")
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    if verify == "exact":
        ga = sets.select(F.col("id").alias("id_a"), F.col("grams").alias("__ga"))
        gb = sets.select(F.col("id").alias("id_b"), F.col("grams").alias("__gb"))
        return (
            cand.join(ga, "id_a")
            .join(gb, "id_b")
            .withColumn("inter", F.size(F.array_intersect("__ga", "__gb")))
            .withColumn(
                "jaccard",
                F.col("inter")
                / (F.size("__ga") + F.size("__gb") - F.col("inter")),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    verified = (
        cand.join(sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("__sa")), "id_a")
        .join(sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("__sb")), "id_b")
        .withColumn(
            "est_jaccard",
            F.size(
                F.filter(
                    F.zip_with("__sa", "__sb", lambda a, b: a == b), lambda m: m
                )
            )
            / F.lit(float(num_hashes)),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )
    return verified

"""n-gram Jaccard similarity pairs.

Candidate generation by shared-n-gram inverted index (equi-join on the
n-gram hash), with similarity computed over the *rare* n-gram sets:
grams with document frequency > ``max_df`` (stop-shingles) are excluded
from both candidate generation and the Jaccard itself — the standard
corpus-scale skew guard (a gram shared by half the corpus carries no
similarity signal but would explode the self-join).

Execution shape (100 TB-ready):
- gram build is one projection over the documents (tokens via
  ``arrays_zip`` of shifted slices, so no outer expression is referenced
  inside a higher-order-function lambda — Catalyst re-evaluates such
  references per element, measured 9× slower for the regex tokenizer);
- the per-doc rare-set size rides on the inverted-index rows (window
  over id) — no corpus-sized side-table broadcast anywhere; only the
  tiny stop-gram set is broadcast (anti-join);
- intersection sizes come from ``groupBy(pair).count()`` on the
  inverted-index self-join — no wide gram arrays ever shuffle;
- operator-internal caches go through ``caching.bounded_cache`` (plan
  dedup + bounded registry with eviction), not bare ``.cache()``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from arcadedb_spark.caching import bounded_cache
from arcadedb_spark.parallel import ensure_min_partitions
from arcadedb_spark.text.fulltext import tokenize


def ngram_hashes(text_col, n: int) -> Column:
    """Hashed distinct n-gram set of a text column (array<long>).

    Shingles are built by zipping ``n`` shifted slices of the token array
    so the per-element lambda touches only its own struct element; docs
    shorter than ``n`` tokens yield their whole token sequence as one
    gram, and empty docs hash the empty string (both matching a
    ``sequence``+``slice`` formulation and the DuckDB oracle).
    """
    t = tokenize(text_col)
    length = F.size(t)
    slices = [
        F.slice(t, k + 1, F.greatest(length - (n - 1), F.lit(1))) for k in range(n)
    ]
    grams = F.transform(
        F.arrays_zip(*slices),
        lambda s: F.xxhash64(F.concat_ws(" ", *[s[f"{k}"] for k in range(n)])),
    )
    return F.when(length == 0, F.array(F.xxhash64(F.lit("")))).otherwise(
        F.array_distinct(grams)
    )


def ngram_sets(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, grams: array<long>) per document."""
    return docs.select(
        F.col(id_col).alias("id"), ngram_hashes(F.col(text_col), n).alias("grams")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int = 1000,
    prefix_filter: bool | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard ≥ threshold) on rare-n-gram sets.

    With ``prefix_filter`` (AllPairs/PPJoin prefix principle): only the
    ``s − ⌈t·s⌉ + 1`` globally-rarest grams of each document enter the
    candidate self-join — any pair with jaccard ≥ t is guaranteed to
    collide inside these prefixes, so the result is EXACT while the
    quadratic join shrinks by ~(1−t)².  Intersections are then computed
    once per surviving candidate from the full gram arrays.

    Default (None) is adaptive: the prefix path costs an extra window
    sort + distinct + two array joins, and only prunes the self-join by
    factor (1−t)² — measured break-even is around t ≈ 0.5, so it
    auto-enables for high thresholds (the near-dup regime) and stays on
    the one-shot inverted-index join for low ones.
    """
    if prefix_filter is None:
        prefix_filter = threshold >= 0.5
    src = ensure_min_partitions(docs.select(id_col, text_col))
    # materialize the (id, grams) arrays BEFORE exploding them: explode's
    # child expression is inlined into the Generate node, where it runs
    # interpreted and without common-subexpression elimination — the
    # tokenizer is referenced ~8× inside the gram expression, so a direct
    # explode re-tokenizes every doc repeatedly (measured 1.72 s inlined
    # vs 0.13 s over a materialized array column at sf0.1).  The exploded
    # inverted index is cached on top because three consumers read it
    # (document frequency, candidate join left/right); its fill is a
    # cheap Generate over the cached arrays.
    sets = bounded_cache(ngram_sets(src, id_col, text_col, n))
    # the exploded inverted index is NOT cached: each consumer's Generate
    # over the cached gram arrays is cheap, and the frame that IS worth
    # keeping (below) already carries the per-doc size folded in
    inv = sets.select("id", F.explode("grams").alias("g"))
    # skew guard: stop-shingles (df > max_df) leave the similarity space.
    # Only the HOT grams are materialized driver-side — the stop set is
    # tiny by construction, so the anti-join broadcast is a few KB where
    # broadcasting the rare (kept) side would ship the whole gram
    # vocabulary.
    dfreq = inv.groupBy("g").agg(F.count("*").alias("df"))
    hot = dfreq.filter(F.col("df") > max_df)

    if not prefix_filter:
        # per-doc rare-set size comes straight off the CACHED gram arrays:
        # gram arrays are distinct by construction, so the kept set is
        # array_except(grams, stop) and sz its size — computed row-local
        # during the one-time cache fill.  The former shape shuffled the
        # whole index by id (count-over-Window) only for the pair join to
        # re-shuffle it by g (§2.1); the stop list rides as a single-row
        # broadcast (it is tiny by construction — broadcasting the KEPT
        # vocabulary would be the scale hazard, §3.1).
        stop_arr = F.broadcast(hot.agg(F.collect_list("g").alias("__stop")))
        kept = sets.crossJoin(stop_arr).select(
            "id", F.array_except("grams", "__stop").alias("__keep")
        )
        inv2_sz = bounded_cache(
            kept.select(
                "id", F.size("__keep").alias("sz"), F.explode("__keep").alias("g")
            )
        )
        l, r = inv2_sz.alias("l"), inv2_sz.alias("r")
        return (
            l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col("l.id") < F.col("r.id")))
            .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .agg(
                F.count("*").alias("inter"),
                # sz is functionally determined by the group key
                F.min(F.col("l.sz")).alias("__sa"),
                F.min(F.col("r.sz")).alias("__sb"),
            )
            .withColumn(
                "jaccard",
                F.col("inter") / (F.col("__sa") + F.col("__sb") - F.col("inter")),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )

    # rare-gram array per doc, sorted by (global df, g): the SAME order
    # for every doc, so the prefix principle applies.  dfreq is keyed by
    # g like inv2, so this is a co-keyed equi-join (AQE broadcasts it
    # when small; at scale it shuffle-joins without any giant broadcast).
    stop = F.broadcast(hot.select("g"))
    inv2 = inv.join(stop, "g", "left_anti")
    # the ranking window below is keyed by id anyway, so sz shares its
    # shuffle here — only the non-prefix path had a dedicated sz exchange
    sz_w = F.count("*").over(Window.partitionBy("id"))
    inv2 = bounded_cache(inv2)  # two consumers: ranked chain + arrays
    with_df = inv2.join(dfreq, "g")
    ranked = with_df.withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("id").orderBy(F.asc("df"), F.asc("g"))
        ),
    ).withColumn("sz", sz_w)
    prefix = ranked.filter(
        F.col("__rn") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    ).select("id", "g")
    l, r = prefix.alias("l"), prefix.alias("r")
    cands = (
        l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    arrays = inv2.groupBy("id").agg(F.collect_list("g").alias("grams"))
    ga = arrays.select(F.col("id").alias("id_a"), F.col("grams").alias("__ga"))
    gb = arrays.select(F.col("id").alias("id_b"), F.col("grams").alias("__gb"))
    return (
        cands.join(ga, "id_a")
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

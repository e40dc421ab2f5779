"""Sequence packing: assign documents to fixed token-budget bins in a
deterministic global order — the batch-construction step of a training
pipeline (docs are concatenated into ~budget-token training sequences
in a stable order, so every re-run and every engine packs identically).

This is the one operator in the inventory whose SEMANTICS demand a
global order (a running token total over the whole corpus). The naive
form — one window cumsum over ORDER BY doc_id with no partition key —
funnels the entire corpus through a single task. The scale form here is
the textbook two-phase distributed scan:

1. bucket the order key into contiguous integer ranges (bucket =
   order_key / span, span sized off a 1-row max agg — broadcast,
   deterministic, no sampling);
2. per-bucket token sums — a map-side-combinable agg that collapses to
   ``n_buckets`` rows;
3. exclusive prefix offsets over those n_buckets rows on the driver
   (model-sized, like the k-means centroid loop);
4. broadcast the offsets back; within each bucket a window cumsum
   (partitioned by bucket — parallel, no funnel) plus the bucket's
   offset reconstructs the EXACT global running total.

Every doc lands in bin floor(cum_before / budget) where cum_before is
the exact number of tokens packed before it in doc_id order — greedy
packing with overflow (a doc that crosses a bin boundary belongs to the
bin it starts in; budget overruns are the caller's padding/truncation
policy, and `spill = cum_before % budget + n_tokens - budget` is
emitted so the policy has the number it needs).

All arithmetic is exact int64 (token counts are integers; 10^12 docs x
10^4 tokens ~ 2^53 stays far inside int64), so Spark, DuckDB, and a
serial fold agree bit-for-bit regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    n_buckets: int = 64,
) -> DataFrame:
    """(order_col, n_tokens, cum_before, bin, spill) — exact global
    prefix sum over ``order_col`` order, computed as a two-phase scan.

    ``order_col`` must be a non-negative integral key (doc_id). Bucket
    ranges are contiguous in key order, so per-bucket offsets compose
    into the exact global running total; key density does NOT matter
    (empty buckets contribute zero).
    """
    base = df.select(
        F.col(order_col).cast("long").alias("id"),
        F.col(token_col).cast("long").alias("n_tokens"),
    )
    # 1-row agg -> span; ceil so ids land in [0, n_buckets)
    max_id = base.agg(F.max("id").alias("m")).collect()[0]["m"]
    if max_id is None:
        return base.select(
            "id",
            "n_tokens",
            F.lit(0).cast("long").alias("cum_before"),
            F.lit(0).cast("long").alias("bin"),
            F.lit(0).cast("long").alias("spill"),
        )
    span = max(1, (int(max_id) + n_buckets) // n_buckets)
    withb = base.withColumn("bucket", (F.col("id") / F.lit(span)).cast("long"))

    # per-bucket sums collapse map-side to <= n_buckets rows; the
    # exclusive prefix is model-sized driver state (same shape as the
    # k-means centroid loop and the IVF centroid load)
    sums = {
        int(r["bucket"]): int(r["s"])
        for r in withb.groupBy("bucket").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets, acc = [], 0
    for b in range(n_buckets):
        offsets.append((b, acc))
        acc += sums.get(b, 0)
    odf = F.broadcast(
        df.sparkSession.createDataFrame(offsets, schema="bucket long, offset long")
    )

    # within-bucket cumsum is partitioned by bucket — parallel, no
    # global funnel; rowsBetween makes the frame explicit (ties cannot
    # occur: id is the partition-unique order key)
    w = (
        Window.partitionBy("bucket")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        withb.join(odf, "bucket")
        .withColumn(
            "cum_before",
            F.col("offset") + F.sum("n_tokens").over(w) - F.col("n_tokens"),
        )
    )
    return cum.select(
        "id",
        "n_tokens",
        "cum_before",
        (F.col("cum_before") / F.lit(budget)).cast("long").alias("bin"),
        F.greatest(
            F.lit(0).cast("long"),
            F.col("cum_before") % F.lit(budget) + F.col("n_tokens") - F.lit(budget),
        ).alias("spill"),
    )


def bounded_prefix_hist(
    df: DataFrame, col: str, max_distinct: int = 1024
) -> tuple[dict, int]:
    """Exclusive prefix counts over a BOUNDED-domain column, collected
    to the driver: returns ({value: docs-with-strictly-smaller-value},
    total). The driver-prefix global-rank pattern (t10 curriculum
    shards) is only valid while the histogram stays model-sized — this
    guard fails fast if a wide-domain column (e.g. a float score) would
    silently turn the collect into a driver-side funnel; callers past
    the bound should use the two-phase distributed scan above instead.
    """
    # limit(max_distinct+1) bounds what can reach the driver: a
    # wide-domain column trips the guard after at most one excess row
    # instead of funnelling its whole histogram through the collect.
    hist = sorted(
        (r["v"], r["n"])
        for r in df.groupBy(F.col(col).alias("v"))
        .agg(F.count("*").alias("n"))
        .limit(max_distinct + 1)
        .collect()
    )
    if len(hist) > max_distinct:
        raise ValueError(
            f"prefix histogram over {col!r} has MORE than {max_distinct} "
            "distinct values (count capped by the guard's limit — the "
            "true cardinality may be far larger); the driver-prefix rank "
            "pattern requires a bounded small domain — use the two-phase "
            "distributed cumsum (pack_sequences) instead"
        )
    prefix, acc = {}, 0
    for v, c in hist:
        prefix[v] = acc
        acc += c
    return prefix, acc

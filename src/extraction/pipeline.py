"""DataFrame wiring: read → (salted repartition) → mapInArrow → sink.

Scale notes (the design target is a 1000-executor cluster over 10^12
docs; SURVEY.md §4):

- Extraction is embarrassingly parallel: one row = one complete document,
  so the kernel runs as a NARROW mapInArrow — zero shuffles on the hot
  path. The only shuffle anywhere is the optional skew repartition below.
- Column pruning: we select exactly (doc_id, spans) so the scan reads
  only those columns (reference loads whole images unconditionally,
  src/DocumentAnalyzer.py:105-109 — Iceberg/parquet pruning is free here).
- Skew (FIXTURES.md "media-heavy" family): measured, plain uniform
  xxhash64(doc_id) partitioning is near-optimally mass-balanced whenever
  heavy docs outnumber partitions (BENCH/skew_balance.json), and the one
  regime it loses — few enormous docs colliding into one partition — is
  handled by ``repartition_packed``: exact LPT bin packing with
  murmur3-inverse salts (a coarse salt under ``repartition(P, salt)``
  hash-collides; see partition_index_salts). Within the kernel,
  SPAN_BUDGET (segment.py) bounds peak memory.
- Deterministic bucket ids (``with_partition_id``) drive lineage/resume:
  pmod(xxhash64(doc_id), buckets) is stable across runs and cluster
  sizes, unlike physical partition indices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schema import EXTRACTED_SCHEMA
from .segment import extract_batches

# docs with more spans than this are routed to the heavy tier
HEAVY_SPAN_THRESHOLD = 1000


def extract(docs: DataFrame) -> DataFrame:
    """Run the extraction kernel. Narrow — no shuffle."""
    return docs.select("doc_id", "spans").mapInArrow(
        extract_batches, schema=EXTRACTED_SCHEMA
    )


def with_partition_id(docs: DataFrame, num_buckets: int) -> DataFrame:
    """Deterministic bucket id over hash(doc_id) — the lineage/resume key."""
    return docs.withColumn(
        "partition_id",
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(num_buckets)).cast("int"),
    )


_SALT_CACHE: dict[int, list[int]] = {}


def partition_index_salts(spark, num_partitions: int) -> list[int]:
    """Salt values that land EXACTLY on each physical partition index.

    ``repartition(P, col)`` does NOT use the column as a partition
    index — it places a row at pmod(murmur3(col), P). Feeding it a
    column with exactly P distinct values therefore hash-COLLIDES
    (birthday): measured on the bench corpus, the r1/r2 tier-salt
    scheme left 4/8-47/128 partitions EMPTY with max/mean span mass
    2.7-6.2x (BENCH/skew_balance.json) — strictly worse than plain
    uniform hashing. The only DataFrame-API way to address a physical
    partition directly is to invert the hash: ``F.hash`` IS the same
    Murmur3Hash expression HashPartitioning evaluates, so one tiny
    driver-side job finds, for each target index j, an int v_j with
    pmod(hash(v_j), P) == j. Pure function of P — cached per process;
    tests pin the placement with spark_partition_id().
    """
    if num_partitions in _SALT_CACHE:
        return _SALT_CACHE[num_partitions]
    if num_partitions == 1:
        return [0]
    n = max(64 * num_partitions, 4096)  # coupon collector needs ~P ln P
    while True:
        rows = (
            spark.range(n)
            .select(
                F.col("id").cast("int").alias("v"),
                F.pmod(
                    F.hash(F.col("id").cast("int")), F.lit(num_partitions)
                ).alias("j"),
            )
            .groupBy("j")
            .agg(F.min("v").alias("v"))
            .collect()
        )
        got = {r.j: r.v for r in rows}
        if len(got) == num_partitions:
            salts = [got[j] for j in range(num_partitions)]
            _SALT_CACHE[num_partitions] = salts
            return salts
        n *= 4  # astronomically unlikely at 64x coverage


def repartition_packed(
    docs: DataFrame,
    num_partitions: int,
    heavy_span_threshold: int = HEAVY_SPAN_THRESHOLD,
    heavy_docs_hint: int | None = None,
) -> DataFrame:
    """Skew-aware repartition: uniform hash, or exact LPT bin packing.

    What the deterministic mass audit (tools/skew_balance.py) proved:

    - Plain ``repartition(P, xxhash64(doc_id))`` is already near-
      optimally mass-balanced whenever heavy docs are numerous relative
      to P (CLT): max/mean 1.01 at P=8 ... 1.24 at P=128 on the bench
      corpus (12k heavy docs). No stateless salt can beat it — any
      injective salt IS uniform hashing, any coarser salt only loses
      information (and a salt with exactly P values hash-collides into
      empty partitions; see partition_index_salts).
    - The one regime uniform hashing genuinely loses is FEW ENORMOUS
      docs (heavy count ~ P): two 10^6-span docs land in the same
      partition with birthday probability, and that partition is the
      job wall. Fixing that needs mass-AWARE, collision-FREE placement,
      which no hash can provide.

    So: when the heavy tier is large (>= 4*P docs) this returns the
    uniform hash repartition; when it is small, it collects the heavy
    (doc_id, mass) rows — bounded by the same guard — greedily packs
    them longest-processing-time-first onto the least-loaded partition,
    and routes each heavy doc to its exact physical partition via the
    murmur3-inverse salt table. Light docs spread uniformly across all
    P partitions (their per-partition mass is flat by CLT, so LPT packs
    heavy docs on top of a level base). One broadcast join + one
    shuffle; the heavy stats scan is the same pass production reads
    from table statistics.

    ``heavy_docs_hint``: caller-known heavy-tier row count (lineage
    computes it in its per-chunk stats pass); >= 4*P skips the guard
    scan entirely.
    """
    P = num_partitions
    if P < 2:
        return docs.repartition(max(1, P), F.xxhash64("doc_id"))
    uniform = docs.repartition(P, F.xxhash64("doc_id"))
    guard = max(4 * P, 1024)
    if heavy_docs_hint is not None and heavy_docs_hint >= guard:
        return uniform
    nspans = F.size(F.col("spans"))
    heavy_rows = (
        docs.filter(nspans > heavy_span_threshold)
        .select(F.col("doc_id"), nspans.alias("mass"))
        .limit(guard + 1)
        .collect()
    )
    if not heavy_rows or len(heavy_rows) > guard:
        return uniform
    spark = docs.sparkSession
    salts = partition_index_salts(spark, P)
    # LPT greedy bin packing: heaviest doc first onto the least-loaded
    # partition. Bins start level because the light tier spreads
    # uniformly (CLT); ties broken by partition index for determinism.
    import heapq

    bins = [(0, j) for j in range(P)]
    heapq.heapify(bins)
    assign = []
    for r in sorted(heavy_rows, key=lambda r: (-r.mass, r.doc_id)):
        load, j = heapq.heappop(bins)
        assign.append((r.doc_id, salts[j]))
        heapq.heappush(bins, (load + r.mass, j))
    amap = spark.createDataFrame(assign, "doc_id string, __salt int")
    salt_arr = F.array(*[F.lit(int(v)) for v in salts])
    light_salt = F.element_at(
        salt_arr, (F.pmod(F.xxhash64("doc_id"), F.lit(P)) + 1).cast("int")
    )
    return (
        docs.join(F.broadcast(amap), "doc_id", "left")
        .withColumn("__salt", F.coalesce(F.col("__salt"), light_salt))
        .repartition(P, F.col("__salt"))
        .drop("__salt")
    )


def run_extraction(
    docs: DataFrame,
    num_partitions: int | None = None,
    skew_salting: bool = True,
    heavy_docs_hint: int | None = None,
) -> DataFrame:
    """Full pipeline: optional skew-aware repartition + kernel."""
    if num_partitions and skew_salting:
        docs = repartition_packed(
            docs, num_partitions, heavy_docs_hint=heavy_docs_hint
        )
    elif num_partitions:
        docs = docs.repartition(num_partitions, F.xxhash64("doc_id"))
    return extract(docs)

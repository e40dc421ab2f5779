"""DataFrame wiring: read → (salted repartition) → mapInArrow → sink.

Scale notes (the design target is a 1000-executor cluster over 10^12
docs; SURVEY.md §4):

- Extraction is embarrassingly parallel: one row = one complete document,
  so the kernel runs as a NARROW mapInArrow — zero shuffles on the hot
  path. The only shuffle anywhere is the optional skew repartition below.
- Column pruning: we select exactly (doc_id, spans) so the scan reads
  only those columns (reference loads whole images unconditionally,
  src/DocumentAnalyzer.py:105-109 — Iceberg/parquet pruning is free here).
- Skew (FIXTURES.md "media-heavy" family): a 10^5-span doc in a partition
  of 1-span docs makes a straggler. ``repartition_salted`` splits the
  corpus into light/heavy tiers by span count and hashes each tier across
  its own partition budget, so heavy docs spread instead of clumping.
  Within the kernel, SPAN_BUDGET (segment.py) bounds peak memory.
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


def repartition_salted(
    docs: DataFrame,
    num_partitions: int,
    heavy_span_threshold: int = HEAVY_SPAN_THRESHOLD,
    tier_masses: tuple[int, int] | None = None,
) -> DataFrame:
    """Size-bucketed salted repartition (SURVEY.md §7.5 skew handling).

    Heavy (media-heavy skew family) docs get a partition budget
    proportional to their measured share of total SPAN MASS, light docs
    the rest — so expected work per partition is equal across tiers.
    (A fixed heavy fraction is the classic mistake: on the bench corpus
    heavy docs are 5% of rows but ~75% of spans; giving them 25% of
    partitions made heavy tasks ~15x longer than light ones — the
    straggler tail WAS the job wall.) Both tiers salt with
    xxhash64(doc_id) — uniform, deterministic, key-free.

    ``tier_masses=(light, heavy)`` skips the measuring scan; production
    at 10^12 docs would sample or read table statistics instead.
    """
    nspans = F.size(F.col("spans"))
    if tier_masses is None:
        row = docs.select(
            F.sum(F.when(nspans <= heavy_span_threshold, nspans).otherwise(0)).alias("light"),
            F.sum(F.when(nspans > heavy_span_threshold, nspans).otherwise(0)).alias("heavy"),
        ).first()
        tier_masses = (row.light or 0, row.heavy or 0)
    light_mass, heavy_mass = tier_masses
    total = light_mass + heavy_mass
    # < 2 partitions leaves no room for a separate heavy tier (and
    # heavy_parts could reach 0 → pmod by zero in the salt expression)
    if total == 0 or heavy_mass == 0 or num_partitions < 2:
        return docs.repartition(num_partitions, F.xxhash64("doc_id"))
    heavy_parts = min(
        max(1, round(num_partitions * heavy_mass / total)), num_partitions - 1
    )
    light_parts = num_partitions - heavy_parts
    # single scan + single shuffle: salt heavy docs into their own id
    # space past light_parts (a filter+union would scan the corpus twice
    # and shuffle twice)
    salt = F.when(
        nspans > heavy_span_threshold,
        F.lit(light_parts) + F.pmod(F.xxhash64("doc_id"), F.lit(heavy_parts)),
    ).otherwise(F.pmod(F.xxhash64("doc_id"), F.lit(light_parts)))
    return docs.repartition(num_partitions, salt)


def run_extraction(
    docs: DataFrame,
    num_partitions: int | None = None,
    skew_salting: bool = True,
    tier_masses: tuple[int, int] | None = None,
) -> DataFrame:
    """Full pipeline: optional skew repartition + kernel."""
    if num_partitions and skew_salting:
        docs = repartition_salted(docs, num_partitions, tier_masses=tier_masses)
    elif num_partitions:
        docs = docs.repartition(num_partitions, F.xxhash64("doc_id"))
    return extract(docs)

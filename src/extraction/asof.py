"""As-of (backward) join: each probe row picks the latest build row at
or before its timestamp, per key.

Spark has no native ASOF JOIN. The two candidate plans at 100 TB:

- range theta-join (``b.ts <= a.ts`` + per-key max): expands to every
  (probe, earlier-build) PAIR before reducing — quadratic per key on
  exactly the hot keys that matter; a non-starter.
- union-tag + window carry-forward (THIS implementation): union the two
  streams, sort each key's partition once by (ts, tag), and let
  ``last(value, ignorenulls=True)`` carry the most recent build payload
  forward into each probe row. ONE shuffle of probe+build rows on the
  key, linear work, no pair expansion — the same shape Flink/kdb use
  for temporal joins.

Tie contract: a build row at exactly probe.ts IS visible (inclusive
``<=``) because builds sort before probes at equal ts (tag 0 < tag 1).
Ties between two build rows at the same (key, ts) are DETERMINISTIC:
the payload struct participates in the window ordering, so the
lexicographically largest (value_cols, in declaration order) wins —
relying on sort stability instead would silently change winners with
the partitioning.

Reference analog: the evaluation pass pairing each produced page with
the latest matching ground-truth artifact by filename
(/root/reference/src/evaluation.py, HelperMethods.py:142-157) — an
as-of-style "most recent matching record" lookup.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Backward as-of join; returns `probe` columns + `value_cols` from
    the latest build row with ``build.ts <= probe.ts`` (null if none).

    `probe` and `build` must both contain `key_cols` and `ts_col`;
    `value_cols` must exist in `build` and not collide with `probe`.
    """
    keys = list(key_cols)
    vals = list(value_cols)
    payload = F.struct(*[F.col(c).alias(c) for c in vals])
    probe_cols = [c for c in probe.columns]

    b = build.select(
        *keys,
        ts_col,
        payload.alias("__asof_payload"),
        F.lit(0).alias("__asof_tag"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in probe_cols if c not in keys and c != ts_col],
    )
    # probe rows carry a NULL payload (not a struct of nulls) so
    # last(ignorenulls) skips them
    a = probe.select(
        *keys,
        ts_col,
        F.lit(None).cast(
            b.schema["__asof_payload"].dataType
        ).alias("__asof_payload"),
        F.lit(1).alias("__asof_tag"),
        *[c for c in probe_cols if c not in keys and c != ts_col],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col(ts_col).asc(),
            F.col("__asof_tag").asc(),
            # deterministic build/build tie-break at equal (key, ts):
            # largest payload wins (probes are alone in their tag class,
            # their null payload never competes)
            F.col("__asof_payload").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = a.unionByName(b).withColumn(
        "__asof_carried",
        F.last("__asof_payload", ignorenulls=True).over(w),
    )
    return carried.filter(F.col("__asof_tag") == 1).select(
        *probe_cols,
        *[F.col("__asof_carried")[c].alias(c) for c in vals],
    )

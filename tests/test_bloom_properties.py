"""Bloom-decontamination invariants, pinned CI-grade (pure DuckDB —
runs the exact oracle SQL that mirrors dedup.bloom_decontaminate_stats
bit for bit, so these are properties of the shipped operator):

1. NO FALSE NEGATIVES at any sizing: every truly-contaminated doc is
   bloom-flagged (the defining bloom guarantee; a miss means the hash
   slicing or limb packing broke).
2. FP count is non-increasing as bits/item grows (the sizing knob
   behaves like a bloom filter should).
3. bloom_flagged == exact_flagged + fp_docs (the stats row is
   internally consistent).
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="driver-generated testdata absent",
)


def _stats(bpi: int):
    from extraction.oracles_sql import ORACLES

    base = ORACLES["dedup_decontaminate_bloom"]
    sql = base.replace(
        "16 * GREATEST(count(*), 1)", f"{bpi} * GREATEST(count(*), 1)"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{os.path.join(SF_DIR, 'documents.parquet')}'"
    )
    n, bl, ex, fp, fn, bsh, esh = con.execute(sql).fetchone()
    return dict(
        n_probed=n, bloom=bl, exact=ex, fp=fp, fn=fn, bloom_sh=bsh, exact_sh=esh
    )


def test_no_false_negatives_and_monotone_fp():
    prev_fp = None
    for bpi in (2, 8, 16, 64):
        s = _stats(bpi)
        assert s["fn"] == 0, (bpi, s)
        assert s["bloom"] == s["exact"] + s["fp"], (bpi, s)
        assert s["bloom_sh"] >= s["exact_sh"], (bpi, s)
        if prev_fp is not None:
            assert s["fp"] <= prev_fp, (bpi, s, prev_fp)
        prev_fp = s["fp"]

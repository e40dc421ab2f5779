"""Measure the bloom-decontamination FP rate vs the bits_per_item knob.

Pure DuckDB (no Spark session — safe to run alongside benches): reuses
the exact oracle SQL of ``dedup_decontaminate_bloom`` (which mirrors
``dedup.bloom_decontaminate_stats`` bit for bit) and rewrites only the
``16 *`` sizing factor, so the measured numbers are the numbers the
Spark operator would produce at each operating point.

Usage: python tools/bloom_fp_sweep.py [sf_dir]   (default sf0.01)
Prints a markdown table; paste into BENCH/DEDUP_RECALL.md.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))


def main() -> int:
    import duckdb

    from extraction.oracles_sql import ORACLES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    base = ORACLES["dedup_decontaminate_bloom"]
    assert base.count("16 * GREATEST(count(*), 1)") == 1

    con = duckdb.connect()
    con.execute("SET memory_limit='8GB'")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{os.path.join(sf_dir, 'documents.parquet')}'"
    )
    print("| bits/item | n_probed | bloom_flagged | exact_flagged | fp_docs | fn_docs |")
    print("|---|---|---|---|---|---|")
    for bpi in (2, 4, 8, 16, 32):
        sql = base.replace(
            "16 * GREATEST(count(*), 1)", f"{bpi} * GREATEST(count(*), 1)"
        )
        row = con.execute(sql).fetchone()
        n, bl, ex, fp, fn, _, _ = row
        assert fn == 0, f"false negatives at bits_per_item={bpi}: {fn}"
        print(f"| {bpi} | {n} | {bl} | {ex} | {fp} | {fn} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

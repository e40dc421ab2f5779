"""Oracle parity for the demoted operating-point variants.

Round 5 moved the 11 redundant variants (``__spark_entry__.
variant_queries()``) off the driver/bench contract — they were 14.8s of
the 95.1s round-4 bench while each family's representative stays green in
``queries()``. This suite keeps every one of them oracle-checked: each
variant runs on Spark at sf0.001 and must match its DuckDB oracle with
the driver's own comparator semantics (columns sorted by name, rows
sorted, repr-normalized floats) — the same gate, just off the per-round
budget. On-demand at bigger sf:
``python tools/compare_oracle.py /root/testdata/sf0.01 --variants``.
"""

import math
import os

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_VARIANT_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return v


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("SET memory_limit='4GB'")
    con.execute("SET threads TO 4")
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def _variant_names():
    import sys

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    return sorted(entry.variant_queries())


@pytest.mark.parametrize("name", _variant_names())
def test_variant_matches_oracle(spark, duck, name):
    import __spark_entry__ as entry

    fn = entry.variant_queries()[name]
    sql = entry.oracle_sql().get(name)
    assert sql is not None, f"{name} demoted without an oracle"
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = sdf.collect()
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert _norm(srows, scols) == _norm(drows, dcols)


def test_variants_disjoint_from_contract():
    """A name must live in exactly one registry: the driver contract or
    the demoted-variant set — double-listing would double-bench it."""
    import sys

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    overlap = set(entry.queries()) & set(entry.variant_queries())
    assert overlap == set()

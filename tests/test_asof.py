"""asof_join contract: latest build row at or before each probe ts per
key; equal-ts build row IS visible (inclusive); no match -> null; keys
never cross."""

import datetime as dt

from extraction.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_join_contract(spark):
    probe = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(1)), (3, 10, _ts(9)), (4, 20, _ts(5))],
        "probe_id long, user_id long, ts timestamp",
    )
    build = spark.createDataFrame(
        [(100, 10, _ts(2)), (101, 10, _ts(5)), (102, 10, _ts(7)), (103, 30, _ts(0))],
        "b_id long, user_id long, ts timestamp",
    )
    got = {
        r["probe_id"]: r["b_id"]
        for r in asof_join(
            probe, build, ["user_id"], "ts", ["b_id"]
        ).collect()
    }
    assert got == {
        1: 101,  # equal-ts build visible (inclusive <=)
        2: None,  # nothing at or before ts=1
        3: 102,  # latest of {2,5,7}
        4: None,  # key 20 has no builds; key 30's never leaks
    }

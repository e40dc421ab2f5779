"""g5_watershed_basins contract: the 1-D watershed split must match a
pure-Python reference on handcrafted profiles covering every rule —
strict interior valley (cuts, minimum joins the right basin), plateau
valley (never cuts), decline into an axis gap (run tail, no cut), and
multi-user partitioning."""

import datetime

import __spark_entry__ as entry


def _mk_events(profiles):
    """profiles: {user_id: {hour: count}} -> event rows on one day."""
    rows, eid = [], 0
    for uid, prof in profiles.items():
        for hour, n in prof.items():
            for _ in range(n):
                rows.append(
                    (eid, datetime.datetime(2026, 1, 5, hour, 30), uid,
                     "click", 1.0, "{}")
                )
                eid += 1
    return rows


def _py_basins(prof):
    hours = sorted(prof)
    basins, cur = [], []
    for idx, h in enumerate(hours):
        prev_h = hours[idx - 1] if idx else None
        nxt_h = hours[idx + 1] if idx + 1 < len(hours) else None
        valley = (
            prev_h == h - 1
            and nxt_h == h + 1
            and prof[prev_h] > prof[h] < prof[nxt_h]
        )
        # NOTE valley uses prev CONTIGUOUS value; when prev is a gap the
        # gap rule fires anyway, matching the engine's OR
        gap = prev_h is None or h - prev_h != 1
        if gap or valley:
            if cur:
                basins.append(cur)
            cur = []
        cur.append(h)
    if cur:
        basins.append(cur)
    return [
        (b[0], b[-1], len(b), max(prof[h] for h in b),
         sum(prof[h] for h in b))
        for b in basins
    ]


def test_watershed_matches_python_reference(spark, tmp_path):
    profiles = {
        # strict valley at hour 3 (5 > 2 < 7): cut, 3 joins the right
        1: {1: 4, 2: 5, 3: 2, 4: 7, 5: 1},
        # plateau valley (5 > 2 = 2 < 6): no strict minimum, no cut
        2: {1: 5, 2: 2, 3: 2, 4: 6},
        # decline into a gap (9 > 2, then gap): tail, no valley cut;
        # the gap itself starts the next basin
        3: {1: 9, 2: 2, 7: 3, 8: 1},
        # monotone run: single basin
        4: {0: 1, 1: 2, 2: 3},
    }
    df = spark.createDataFrame(
        _mk_events(profiles),
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = entry.q_g5_watershed_basins(spark, str(tmp_path)).collect()
    got = {}
    for r in out:
        got.setdefault(r["user_id"], []).append(
            (r["start_hour"], r["end_hour"], r["n_hours"], r["peak"],
             r["mass"])
        )
    for uid in got:
        got[uid].sort()

    for uid, prof in profiles.items():
        assert got[uid] == sorted(_py_basins(prof)), uid
    # the shape claims the fixture exists for: user 1 splits, user 2
    # and 4 do not, user 3 splits only at the gap
    assert len(got[1]) == 2 and len(got[2]) == 1
    assert len(got[3]) == 2 and len(got[4]) == 1

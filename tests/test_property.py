"""Property tests: kernel == oracle on adversarial random documents.

The corpus generator (FIXTURES.md families) covers realistic shapes; this
covers hostile ones — unsorted/duplicate offsets, null texts on text
spans, unknown kinds, marker/caption/title lookalikes, empty docs —
asserting exact span-sequence equality between the vectorized Arrow
kernel and the pure-Python oracle (SURVEY.md §5.4).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from extraction.oracle import extract_doc
from extraction.pipeline import extract
from extraction.schema import DOCS_SCHEMA

TEXTS = st.one_of(
    st.none(),
    st.text(alphabet="aA zZ.!?,09 ", max_size=30),
    st.sampled_from(
        [
            "",
            "Read our Privacy Policy now",
            "figure 3: a caption lookalike",
            "Fig. 9: terse",
            "Word Word Word",
            "word word word word.",
            "A " * 50,  # long, half-capitalized
            "ALL RIGHTS RESERVED footer",
            "Subscribe to our newsletter today",
            # word/cap-count edges: consecutive capitals once double-counted
            # by RE2 ^-re-anchoring; unicode whitespace vs str.split()
            "0 AA",
            "AA BB CC dd",
            "X Y Z",
        ]
    ),
)

KINDS = st.sampled_from(
    ["text", "text", "text", "media", "sep", "nav", "ad", "foot", "script", "mystery"]
)


SPANS = st.lists(
    st.builds(
        lambda kind, text, ref, offset: {
            "kind": kind,
            "text": text if kind != "media" else None,
            "media_ref": ref if kind == "media" else None,
            "offset": offset,
        },
        KINDS,
        TEXTS,
        st.sampled_from(["media://a", "media://b"]),
        st.integers(min_value=0, max_value=120),
    ),
    max_size=40,
)

DOCS = st.lists(SPANS, min_size=1, max_size=8)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(DOCS)
def test_kernel_equals_oracle_on_random_docs(spark, docs):
    rows = [(f"d{i}", spans) for i, spans in enumerate(docs)]
    df = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    got = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.order) for s in r.spans]
        for r in extract(df).collect()
    }
    want = {
        doc_id: [
            (s["kind"], s["text"], s["media_ref"], s["order"])
            for s in extract_doc(spans)
        ]
        for doc_id, spans in rows
    }
    assert got == want


# --- asof_join vs brute-force reference on random streams ----------------

ASOF_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # key (few keys -> dense per-key streams)
        st.integers(min_value=0, max_value=50),     # ts (small range -> many exact ties)
        st.booleans(),                              # True = probe, False = build
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ASOF_EVENTS)
def test_asof_join_equals_bruteforce(spark, events):
    """For each probe, the carried build value must equal the max-
    (ts, id) build row with ts <= probe.ts on the same key — including
    probe/build ties at the same ts (inclusive) and build/build ties
    (larger id wins: the union sort is (ts, tag, payload) and the
    payload struct's leading field is the id)."""
    import datetime as dt

    from extraction.asof import asof_join

    base = dt.datetime(2024, 1, 1)
    probes, builds = [], []
    for i, (k, t, is_probe) in enumerate(events):
        if is_probe:
            probes.append((i, k, base + dt.timedelta(seconds=t), t))
        else:
            builds.append((i, k, base + dt.timedelta(seconds=t), t))
    if not probes:
        probes = [(len(events), 0, base, 0)]

    probe_df = spark.createDataFrame(
        [(i, k, ts) for i, k, ts, _ in probes],
        "probe_id long, k long, ts timestamp",
    )
    build_df = spark.createDataFrame(
        [(i, k, ts) for i, k, ts, _ in builds],
        "b_id long, k long, ts timestamp",
    ) if builds else spark.createDataFrame(
        [], "b_id long, k long, ts timestamp"
    )

    got = {
        r["probe_id"]: r["b_id"]
        for r in asof_join(probe_df, build_df, ["k"], "ts", ["b_id"]).collect()
    }

    for pid, pk, _, pt in probes:
        cands = [(bt, bi) for bi, bk, _, bt in builds if bk == pk and bt <= pt]
        want = max(cands)[1] if cands else None
        assert got[pid] == want, (pid, pk, pt, sorted(cands), got[pid])

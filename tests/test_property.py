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

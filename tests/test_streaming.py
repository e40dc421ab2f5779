"""Streaming ingest: the extraction kernel over Structured Streaming.

The reference has no streaming of any kind (SURVEY.md §2.9); this is an
engine extension: the same stateless mapInArrow kernel runs unchanged on
a file-source stream (micro-batches of whole documents), so a 10^12-doc
corpus can be extracted incrementally as new partitions land. Stateless
per-doc semantics mean no watermarks/state are needed — each doc is
complete within its row.
"""

from __future__ import annotations

import pytest

from extraction.corpus import corpus_df, gen_corpus
from extraction.oracle import extract_corpus
from extraction.pipeline import extract
from extraction.schema import DOCS_SCHEMA

N_DOCS = 300
HEAVY = 120


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "docs")
    # several files -> several micro-batches under maxFilesPerTrigger
    corpus_df(spark, N_DOCS, heavy_spans=HEAVY, slices=6).write.parquet(path)
    return path


def test_streaming_extraction_matches_oracle(spark, corpus_path):
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(corpus_path)
    )
    q = (
        extract(stream)
        .writeStream.format("memory")
        .queryName("extracted_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.lastProgress is not None

    got = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.order) for s in r.spans]
        for r in spark.sql("SELECT * FROM extracted_stream").collect()
    }
    want = {
        doc_id: [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in spans]
        for doc_id, spans in extract_corpus(
            gen_corpus(N_DOCS, heavy_spans=HEAVY)
        ).items()
    }
    assert got == want

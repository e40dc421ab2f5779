"""Stateful streaming ingest: fragment assembly for interleaved corpora.

At 10^12-doc scale documents do not arrive atomically: an interleaved
text+media document is written as FRAGMENTS (crawler chunks, page
ranges, media sidecars) that land across micro-batches, possibly more
than once (at-least-once sources). The batch pipeline requires one
complete ``(doc_id, spans)`` row per document; this module closes the
gap with a custom stateful operator (``applyInPandasWithState``) that
accumulates fragments per doc_id and emits each document exactly once —
when its last fragment arrives — then hands the completed docs to the
SAME vectorized kernel (``pipeline.extract``) as a stateless downstream
map. After emission the key keeps a COMPLETION TOMBSTONE (state with a
null payload): a duplicate fragment redelivered after the doc closed is
swallowed instead of re-opening the doc and re-emitting it (the classic
at-least-once double-emit; caught by a single-fragment doc whose only
fragment is delivered twice across micro-batches). ``timeout_sec``
bounds BOTH lifetimes: open docs whose tail never lands are evicted
(dead-letter seam), and tombstones expire once the source's redelivery
horizon has passed — so steady-state store size is in-flight docs plus
one tiny tombstone per recently-completed doc, never corpus-sized. The hot path therefore stays Arrow-vectorized over whole
micro-batches of completed docs; the per-key Python granularity of the
state API touches only the cheap fragment concat, never the kernel.

Fragment contract (``FRAGMENTS_SCHEMA``): every fragment carries
``(doc_id, frag_id ∈ [0, n_frags), n_frags, spans)``. The ingest writer
knows how many fragments it split a document into, so completion is a
per-key local test (``seen == n_frags``) — no global coordination, no
watermark needed for the happy path. Duplicate delivery is idempotent
both before completion (a ``frag_id`` already in state is ignored) and
after it (tombstone, above).

Scale/robustness notes:

- State per open doc is the pickled ``{frag_id: span tuples}`` dict in a
  single binary column. Pickle ties checkpoint state to the Python
  minor version — acceptable for an in-flight buffer (drain the stream
  before upgrading workers), and it keeps the state schema stable while
  the span struct evolves.
- ``timeout_sec`` arms a processing-time timeout per open doc: a doc
  whose tail fragment never lands is evicted instead of leaking state
  forever. Evicted docs are DROPPED from the output (production would
  route them to a dead-letter sink; emitting a partial doc would make
  output content timing-dependent, which the span-sequence-equality
  contract forbids). Trigger caveat: with ProcessingTimeTimeout, Spark's
  ``shouldRunAnotherBatch`` is permanently true, so even
  ``Trigger.AvailableNow`` queries never self-terminate — they keep
  scheduling no-data batches to fire timers. timeout_sec is for
  continuously-running ingest; batch-drain runs should pass
  ``timeout_sec=None`` (NoTimeout terminates normally) or stop() after
  ``processAllAvailable()``.
- The stateful shuffle partitions by doc_id — the same key the batch
  path salts on. Individual fragments are small, but a doc's state
  approaches its full span payload just before completion, and every
  micro-batch that touches an open doc rewrites the whole accumulated
  payload (state-store write amplification). At 10^12 docs the
  buffer-in-state design here is right for docs that complete within a
  few micro-batches; for long-lived stragglers, production would keep
  only ``(seen, n_frags)`` counters in state, land fragments in a
  staging table, and emit completed doc_ids to drive an assembly join —
  the state store then holds bytes per doc, not the doc itself. The
  operator contract (exactly-once complete docs, idempotent duplicate
  handling) is identical; only the buffer location changes.

The reference has no streaming of any kind (it batch-processes a closed
directory of images, /root/reference/src/detect_paragraphs.py); this is
an engine extension per SURVEY.md §7.6.
"""

from __future__ import annotations

import pickle

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .pipeline import extract
from .schema import DOCS_SCHEMA, IN_SPAN

FRAGMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("frag_id", IntegerType(), False),
        StructField("n_frags", IntegerType(), False),
        StructField("spans", ArrayType(IN_SPAN, False), False),
    ]
)

# (n_frags, pickled {frag_id: ((kind, text, media_ref, offset), ...)})
_STATE_SCHEMA = StructType(
    [
        StructField("n_frags", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def _span_tuples(cell) -> tuple:
    """Arrow→pandas gives one dict per struct span; freeze to tuples so
    the state payload is compact and hashable-stable."""
    return tuple(
        (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in cell
    )


def assemble_fragments(frags: DataFrame, timeout_sec: float | None = None) -> DataFrame:
    """Stateful fragment→document assembly. Returns a DOCS_SCHEMA stream
    of COMPLETE documents, each emitted exactly once."""
    timeout_ms = int(timeout_sec * 1000) if timeout_sec else 0

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # open doc: tail never arrived -> evict (dead-letter seam);
            # tombstone: redelivery horizon passed -> forget the doc_id
            state.remove()
            return
        if state.exists:
            n_frags, payload = state.get
            if payload is None:
                # completion tombstone: doc already emitted — swallow
                # redelivered fragments, keep the tombstone armed
                for _ in pdfs:
                    pass
                if timeout_ms:
                    state.setTimeoutDuration(timeout_ms)
                return
            got = pickle.loads(payload)
        else:
            n_frags, got = -1, {}
        for pdf in pdfs:
            # a handful of fragment rows per doc per micro-batch —
            # itertuples here is bookkeeping, the span payloads stay
            # untouched until emission
            for row in pdf.itertuples(index=False):
                n_frags = int(row.n_frags)
                fid = int(row.frag_id)
                if fid not in got:  # at-least-once dedup
                    got[fid] = _span_tuples(row.spans)
        if len(got) == n_frags:
            spans = [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for fid in sorted(got)
                for (k, t, m, o) in got[fid]
            ]
            # leave a tombstone (null payload), not remove(): a duplicate
            # arriving after completion must not re-open + re-emit
            state.update((n_frags, None))
            if timeout_ms:
                state.setTimeoutDuration(timeout_ms)
            yield pd.DataFrame({"doc_id": [key[0]], "spans": [spans]})
        else:
            state.update(
                (n_frags, pickle.dumps(got, protocol=pickle.HIGHEST_PROTOCOL))
            )
            if timeout_ms:
                state.setTimeoutDuration(timeout_ms)

    return frags.groupBy("doc_id").applyInPandasWithState(
        fn,
        outputStructType=DOCS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
        if timeout_sec
        else GroupStateTimeout.NoTimeout,
    )


def assemble_extract(frags: DataFrame, timeout_sec: float | None = None) -> DataFrame:
    """Fragment stream → assembled docs → vectorized extraction kernel.

    The kernel stage is the unchanged batch ``pipeline.extract``
    (mapInArrow) appended AFTER the stateful operator — stateless
    transforms downstream of a stateful op are allowed in append mode,
    and this is what keeps extraction vectorized over whole micro-batches
    of completed docs instead of per-key pandas calls."""
    return extract(assemble_fragments(frags, timeout_sec=timeout_sec))

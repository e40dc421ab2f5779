"""Pure-Python per-document oracle — THE SPEC for the extraction pipeline.

A dependency-light transcription of the reference dataflow semantics
(SURVEY.md §2, §7.4) operating on one ``(doc_id, spans)`` row. The Spark
kernel (classify.py / segment.py / postprocess.py) must produce exactly
this output for every document; tests assert span-sequence equality.

Stage map to the reference (/root/reference):
  classify_span      C1 seat — rule classifier replacing the U-Net
                     (contract only: per-element class, src/DocumentAnalyzer.py:52-59)
  column cuts        X6 ``fit_separators_into_segmentation_mask``
                     (src/SeparatorHelperMethods.py:84-99): `sep` spans cut
                     the doc into columns before grouping
  class-2/0 strip    P3 ``np.putmask(mask, mask==2, 0)``
                     (src/DocumentAnalyzer.py:63,113)
  gap grouping       G1 connected-component labeling degenerated to 1-D
                     (src/DocumentAnalyzer.py:111-115) with GAP = DBSCAN eps
                     (src/DocumentAnalyzer.py:71)
  block extents      G3/G4 bbox min/max (src/DocumentAnalyzer.py:77-103)
  merge              Q2 ``merge_paragraphs``
                     (src/prepare_data/merge_vertical_paragraphs.py:22-98);
                     the early-`break` bug at :94 is deliberately NOT copied
  eliminate          Q1 ``paragraphs_postprocessing`` — order-dependent
                     pairwise small/contained elimination, structure mirrored
                     exactly (src/Postprocessing.py:30-57)
  ordered emit       S5 ``create_page_xml`` ordered r1..rN
                     (src/HelperMethods.py:142-157) → explicit ``order`` col
"""

from __future__ import annotations

from . import constants as C


def classify_span(kind: str, text: str | None) -> tuple[int, str | None]:
    """Rule classifier: returns (cls, out_kind).

    cls ∈ {0 background/boilerplate, 1 content, 2 separator};
    out_kind ∈ {title, paragraph, figure, caption} when cls == 1.
    """
    if kind == C.KIND_SEP:
        return C.CLS_SEPARATOR, None
    if kind in C.BOILERPLATE_KINDS:
        return C.CLS_BACKGROUND, None
    if kind == C.KIND_MEDIA:
        return C.CLS_CONTENT, C.OUT_FIGURE
    if kind == C.KIND_TEXT:
        if text is None:
            return C.CLS_BACKGROUND, None
        low = text.lower()
        for marker in C.BOILERPLATE_MARKERS:
            if marker in low:
                return C.CLS_BACKGROUND, None
        for prefix in C.CAPTION_PREFIXES:
            if low.startswith(prefix):
                return C.CLS_CONTENT, C.OUT_CAPTION
        if _is_title_shaped(text):
            return C.CLS_CONTENT, C.OUT_TITLE
        return C.CLS_CONTENT, C.OUT_PARAGRAPH
    # unknown kinds are stripped (conservative)
    return C.CLS_BACKGROUND, None


def _is_title_shaped(text: str) -> bool:
    if len(text) > C.TITLE_MAX_CHARS:
        return False
    if text.endswith((".", "!", "?")):
        return False
    words = text.split()
    if not words:
        return False
    # ASCII A-Z by definition (keeps the rule bit-identical with the
    # vectorized regex form in classify.py)
    caps = sum(1 for w in words if "A" <= w[:1] <= "Z")
    # caps/len(words) > 1/2, integer-exact
    return caps * C.TITLE_CAP_RATIO_DEN > len(words) * C.TITLE_CAP_RATIO_NUM


def _is_small(b: dict) -> bool:
    """P4 analog (src/Postprocessing.py:24-27)."""
    return b["chars"] < C.MIN_CHARS or b["nspans"] < C.MIN_SPANS


def _is_inside(b1: dict, b2: dict) -> bool:
    """P5 analog with edge tolerance (src/Postprocessing.py:20-21).

    Same-column required: the reference's 2-D containment can never fire
    across columns (disjoint x-ranges); the 1-D offset axis conflates the
    two dimensions, so the column id carries the x-dimension here.
    """
    return (
        b1["col"] == b2["col"]
        and b1["start"] + C.INSIDE_TOL > b2["start"]
        and b1["end"] < b2["end"] + C.INSIDE_TOL
    )


def _same_size(b1: dict, b2: dict) -> bool:
    """P7 analog, integer-exact 0.6 factor (merge_vertical_paragraphs.py:15-19)."""
    l1 = b1["end"] - b1["start"] + 1
    l2 = b2["end"] - b2["start"] + 1
    return max(l1, l2) * C.SAME_SIZE_NUM < min(l1, l2) * C.SAME_SIZE_DEN


def merged_blocks(spans: list[dict]) -> list[dict]:
    """Stages classify → column cuts → gap grouping → Q2 merge; returns
    the block list BEFORE Q1 elimination. Extracted from extract_doc so
    tests can assert structural invariants of the reachable block space
    (e.g. the Q3 strict-containment subsumption proof,
    tests/test_oracle.py)."""
    # --- normalize: stable sort by (offset, array position) ---
    order_in = sorted(range(len(spans)), key=lambda k: (spans[k]["offset"], k))

    # --- classify + column cuts + strip ---
    content = []  # (col, offset, idx, out_kind, text, media_ref)
    col = 0
    for k in order_in:
        s = spans[k]
        cls, out_kind = classify_span(s["kind"], s.get("text"))
        if cls == C.CLS_SEPARATOR:
            col += 1  # X6: cut — subsequent spans belong to the next column
            continue
        if cls == C.CLS_BACKGROUND:
            continue
        content.append(
            {
                "col": col,
                "offset": s["offset"],
                "idx": k,
                "kind": out_kind,
                "text": s.get("text"),
                "media_ref": s.get("media_ref"),
            }
        )

    # --- gap grouping within columns (G1) ---
    blocks: list[dict] = []
    for sp in content:
        b = blocks[-1] if blocks else None
        new = (
            b is None
            or sp["col"] != b["col"]
            or sp["offset"] - b["end"] > C.GAP
        )
        if new:
            blocks.append(
                {
                    "col": sp["col"],
                    "start": sp["offset"],
                    "end": sp["offset"],
                    "chars": 0,
                    "nspans": 0,
                    "spans": [],
                }
            )
            b = blocks[-1]
        b["end"] = max(b["end"], sp["offset"])
        b["nspans"] += 1
        b["chars"] += (
            C.MEDIA_CHAR_WEIGHT if sp["kind"] == C.OUT_FIGURE else len(sp["text"] or "")
        )
        b["spans"].append(sp)

    # --- Q2 merge: same column, gap < MERGE_GAP, similar extent ---
    merged = True
    while merged:
        merged = False
        i = 0
        while i < len(blocks):
            j = i + 1
            while j < len(blocks):
                bi, bj = blocks[i], blocks[j]
                if (
                    bi["col"] == bj["col"]
                    and 0 <= bj["start"] - bi["end"] < C.MERGE_GAP
                    and _same_size(bi, bj)
                ):
                    bi["start"] = min(bi["start"], bj["start"])
                    bi["end"] = max(bi["end"], bj["end"])
                    bi["chars"] += bj["chars"]
                    bi["nspans"] += bj["nspans"]
                    bi["spans"].extend(bj["spans"])
                    del blocks[j]
                    merged = True
                    continue  # re-scan from same j (next block shifted in)
                j += 1
            i += 1
    return blocks


def extract_doc(spans: list[dict]) -> list[dict]:
    """Run the full per-doc pipeline. Input/output span dicts per schema.py."""
    blocks = merged_blocks(spans)

    # --- Q1 eliminate: structure mirrors src/Postprocessing.py:30-57 exactly,
    # including the quirk that a lone block is never small-checked ---
    alive: list[dict | None] = list(blocks)
    for i in range(len(alive)):
        if alive[i] is None:
            continue
        for j in range(i + 1, len(alive)):
            if alive[j] is None:
                continue
            if _is_small(alive[i]) or _is_inside(alive[i], alive[j]):
                alive[i] = None
                break
            elif _is_small(alive[j]) or _is_inside(alive[j], alive[i]):
                alive[j] = None
    survivors = [b for b in alive if b is not None]

    # --- ordered emit: column-major reading order ---
    survivors.sort(key=lambda b: (b["col"], b["start"]))
    out = []
    order = 0
    for b in survivors:
        for sp in sorted(b["spans"], key=lambda s: (s["offset"], s["idx"])):
            out.append(
                {
                    "kind": sp["kind"],
                    "text": sp["text"],
                    "media_ref": sp["media_ref"],
                    "order": order,
                }
            )
            order += 1
    return out


def extract_corpus(rows: list[tuple[str, list[dict]]]) -> dict[str, list[dict]]:
    """Oracle over a corpus: {doc_id: extracted spans}."""
    return {doc_id: extract_doc(spans) for doc_id, spans in rows}

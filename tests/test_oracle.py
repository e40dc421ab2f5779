"""Unit tests of the pure-Python oracle — the pipeline spec (SURVEY.md §5.1/.3)."""

from extraction import constants as C
from extraction.oracle import classify_span, extract_doc


def txt(offset, text="word " * 20 + "end."):
    return {"kind": "text", "text": text, "media_ref": None, "offset": offset}


def med(offset, ref="media://x"):
    return {"kind": "media", "text": None, "media_ref": ref, "offset": offset}


def sep(offset):
    return {"kind": "sep", "text": None, "media_ref": None, "offset": offset}


def kinds(out):
    return [s["kind"] for s in out]


def orders(out):
    return [s["order"] for s in out]


# --- classifier (C1 seat) ---

def test_classify_boilerplate_kinds():
    for k in C.BOILERPLATE_KINDS:
        assert classify_span(k, "anything") == (C.CLS_BACKGROUND, None)


def test_classify_sep_and_media():
    assert classify_span("sep", None) == (C.CLS_SEPARATOR, None)
    assert classify_span("media", None) == (C.CLS_CONTENT, "figure")


def test_classify_dom_heuristic_boilerplate_text():
    cls, _ = classify_span("text", "Read our Privacy Policy here")
    assert cls == C.CLS_BACKGROUND


def test_classify_caption():
    assert classify_span("text", "Figure 3: a chart.") == (C.CLS_CONTENT, "caption")
    assert classify_span("text", "Fig. 3 shows it.") == (C.CLS_CONTENT, "caption")


def test_classify_title_vs_paragraph():
    assert classify_span("text", "Deep Layout Analysis") == (C.CLS_CONTENT, "title")
    # ends with period → not a title
    assert classify_span("text", "Deep Layout Analysis.") == (C.CLS_CONTENT, "paragraph")
    # too long → paragraph
    assert classify_span("text", "Very " * 30 + "Long Title") == (C.CLS_CONTENT, "paragraph")
    # lowercase words → paragraph
    assert classify_span("text", "just some words here") == (C.CLS_CONTENT, "paragraph")


def test_classify_null_text_is_background():
    assert classify_span("text", None) == (C.CLS_BACKGROUND, None)


def test_classify_unknown_kind_is_background():
    assert classify_span("blob", "x") == (C.CLS_BACKGROUND, None)


# --- grouping / cuts (G1/X6/P3) ---

def test_single_block_contiguous():
    out = extract_doc([txt(i) for i in range(5)])
    assert len(out) == 5
    assert orders(out) == [0, 1, 2, 3, 4]


def test_gap_splits_blocks():
    # gap of GAP keeps one block; gap of GAP+1 splits
    one = extract_doc([txt(0), txt(C.GAP), txt(2 * C.GAP)])
    assert len(one) == 3
    # split into [0] and [big far block]: lone small fragment at 0 vs block
    spans = [txt(0)] + [txt(100 + i) for i in range(4)]
    out = extract_doc(spans)
    # fragment is small (1 span) → eliminated; big block survives
    assert len(out) == 4
    assert out[0]["order"] == 0


def test_sep_cuts_columns_and_is_never_emitted():
    spans = [txt(0), txt(1), sep(2), txt(3), txt(4)]
    out = extract_doc(spans)
    assert "sep" not in kinds(out)
    assert len(out) == 4  # both column blocks survive


def test_boilerplate_stripped_creates_gaps():
    nav = {"kind": "nav", "text": "menu", "media_ref": None, "offset": 0}
    spans = [nav] + [txt(i) for i in range(1, 4)]
    out = extract_doc(spans)
    assert all(k == "paragraph" for k in kinds(out))
    assert len(out) == 3


# --- small/contained elimination (Q1, order-dependent) ---

def test_small_block_eliminated_when_not_alone():
    small = [txt(0, "tiny")]  # < MIN_CHARS, < MIN_SPANS
    big = [txt(20 + i) for i in range(4)]
    out = extract_doc(small + big)
    assert len(out) == 4


def test_lone_small_block_survives_reference_quirk():
    # mirrors Postprocessing.py:30-57 — no pair, no check
    out = extract_doc([txt(0, "tiny")])
    assert len(out) == 1


def test_containment_with_tolerance():
    # 2-span fragment [0,1] (not small: 2 spans, >75 chars) right before a
    # big block [5,19]: 0+INSIDE_TOL > 5 and 1 < 19+INSIDE_TOL → swallowed
    frag = [txt(0, "word " * 16), txt(1, "word " * 16)]
    big = [txt(5 + i) for i in range(15)]
    out = extract_doc(frag + big)
    assert len(out) == 15  # fragment swallowed by tolerant containment


# --- merge (Q2) ---

def test_merge_similar_adjacent_blocks():
    # two 4-span blocks split by a gap in (GAP, MERGE_GAP) → re-merged
    a = [txt(i) for i in range(4)]
    b = [txt(4 + C.GAP + 2 + i) for i in range(4)]
    out = extract_doc(a + b)
    assert len(out) == 8
    assert orders(out) == list(range(8))


def test_no_merge_when_sizes_differ():
    a = [txt(0)]
    b = [txt(C.GAP + 3 + i) for i in range(10)]
    out = extract_doc(a + b)
    # small block not merged (size ratio), then eliminated as small
    assert len(out) == 10


# --- ordering / degenerate ---

def test_column_major_order():
    spans = [txt(0), txt(1), sep(2), txt(3), txt(4)]
    out = extract_doc(spans)
    assert [s["order"] for s in out] == [0, 1, 2, 3]
    texts = [s["text"] for s in out]
    assert texts == [spans[0]["text"], spans[1]["text"], spans[3]["text"], spans[4]["text"]]


def test_empty_doc():
    assert extract_doc([]) == []


def test_all_sep_doc():
    assert extract_doc([sep(i) for i in range(4)]) == []


def test_duplicate_offsets_tie_broken_by_position():
    a = txt(1, "Alpha " * 16)
    b = txt(1, "Beta " * 16)
    out = extract_doc([a, b])
    assert [s["text"] for s in out] == [a["text"], b["text"]]


def test_caption_and_figure_kinds_survive():
    spans = [txt(i) for i in range(3)] + [med(3), txt(4, "Figure 1: a chart.")]
    out = extract_doc(spans)
    ks = kinds(out)
    assert "figure" in ks and "caption" in ks

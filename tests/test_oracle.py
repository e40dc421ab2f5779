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


# --- Q3 strict-containment subsumption (documented deviation,
# reference /root/reference/src/prepare_data/merge_vertical_paragraphs.py:76-94) ---
#
# The pipeline deliberately omits the reference's strict-containment
# dedupe pass, claiming Q1's tolerant containment subsumes it. The proof
# has two independent legs, each tested below:
#   (a) REACHABILITY: on every block list the pipeline can actually
#       produce (gap-grouped then merged), same-column blocks are
#       pairwise DISJOINT, so strict containment never fires — the
#       omitted pass is a no-op on all reachable inputs.
#   (b) RELATION SUBSUMPTION: strict containment implies tolerant
#       containment (INSIDE_TOL >= 1), so even on unreachable inputs any
#       strictly-contained block is still eliminated by Q1.


def _strict_inside(b1, b2):
    """The reference's tolerance-free containment
    (merge_vertical_paragraphs.py:76-94), recast to the 1-D axis."""
    return (
        b1["col"] == b2["col"]
        and b2["start"] <= b1["start"]
        and b1["end"] <= b2["end"]
    )


def _strict_dedupe(blocks):
    """Emulation of the reference's strict-containment pass: drop every
    block strictly inside an earlier-surviving one."""
    out = []
    for b in blocks:
        if not any(_strict_inside(b, kept) for kept in out):
            out = [kept for kept in out if not _strict_inside(kept, b)]
            out.append(b)
    return out


def test_merged_blocks_same_col_disjoint_on_corpus():
    # leg (a): across every fixture family (i % 100 covers all), blocks
    # of the same column never overlap at all — a fortiori never nest —
    # so the strict pass can never fire on pipeline-reachable input
    from extraction.corpus import gen_corpus
    from extraction.oracle import merged_blocks

    for doc_id, spans in gen_corpus(300, heavy_spans=60):
        blocks = merged_blocks(spans)
        by_col = {}
        for b in blocks:
            by_col.setdefault(b["col"], []).append(b)
        for col_blocks in by_col.values():
            col_blocks.sort(key=lambda b: b["start"])
            for prev, nxt in zip(col_blocks, col_blocks[1:]):
                assert prev["end"] < nxt["start"], doc_id
        # therefore the reference's strict pass is a no-op here
        assert _strict_dedupe(blocks) == blocks, doc_id


def test_strict_containment_implies_tolerant_elimination():
    # leg (b): feed postprocess_doc an UNREACHABLE block list with a
    # strictly-nested pair — the tolerant rule must still eliminate the
    # inner block, because strict ⟹ tolerant when INSIDE_TOL >= 1
    from extraction.postprocess import postprocess_doc

    assert C.INSIDE_TOL >= 1
    # block 0: [0, 30] big; block 1: [5, 20] strictly inside, NOT small
    survivors = postprocess_doc(
        cols=[0, 0],
        starts=[0, 5],
        ends=[30, 20],
        chars=[400, 200],
        nspans=[10, 5],
    )
    assert survivors == [[0]]  # inner block eliminated, outer survives


def test_strict_containment_equal_extent_edge():
    # equal extents are strict containment both ways in the reference's
    # test; Q1's tolerant rule likewise fires (both directions), and the
    # order-dependent scan keeps exactly one survivor — the later block
    # (pair (i,j) kills i first when i is inside j, mirroring
    # Postprocessing.py:30-57 scan order)
    from extraction.postprocess import postprocess_doc

    survivors = postprocess_doc(
        cols=[0, 0],
        starts=[3, 3],
        ends=[25, 25],
        chars=[300, 300],
        nspans=[8, 8],
    )
    assert survivors == [[1]]

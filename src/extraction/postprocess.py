"""Q1/Q2 analogs: vertical merge + order-dependent elimination.

Operates on the *block metadata* of a single document (a handful of
blocks — the reference's O(n²) pairwise scans are fine at this n and are
the only way to preserve its order-dependent tie-breaking exactly,
SURVEY.md §2.5/§7.5).

- merge:     src/prepare_data/merge_vertical_paragraphs.py:22-98 recast to
             the 1-D axis: same column + gap < MERGE_GAP + similar extent
             → union. The early-`break` bug at :94 is NOT copied; the
             strict-containment dedupe pass (:76-94) is subsumed by the
             tolerant containment in eliminate() and therefore omitted in
             BOTH the oracle and this kernel (documented deviation).
- eliminate: src/Postprocessing.py:30-57 mirrored exactly, including the
             quirk that a lone block is never small-checked.

Must stay semantically identical to oracle.extract_doc's Q1/Q2 stages.
"""

from __future__ import annotations

from . import constants as C


def postprocess_doc(
    cols: list[int],
    starts: list[int],
    ends: list[int],
    chars: list[int],
    nspans: list[int],
) -> list[list[int]]:
    """Merge + eliminate + order the blocks of one document.

    Inputs are parallel per-block lists ordered by (col, start).
    Returns the surviving blocks in column-major reading order, each as
    the list of original block indices merged into it (emit order).
    """
    blocks = [
        {
            "col": cols[i],
            "start": starts[i],
            "end": ends[i],
            "chars": chars[i],
            "nspans": nspans[i],
            "members": [i],
        }
        for i in range(len(cols))
    ]

    # --- Q2 merge (fixpoint) ---
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
                    bi["members"].extend(bj["members"])
                    del blocks[j]
                    merged = True
                    continue
                j += 1
            i += 1

    # --- Q1 eliminate (order-dependent, mirrors Postprocessing.py:30-57) ---
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

    # --- column-major reading order ---
    survivors.sort(key=lambda b: (b["col"], b["start"]))
    return [sorted(b["members"]) for b in survivors]


def _is_small(b: dict) -> bool:
    return b["chars"] < C.MIN_CHARS or b["nspans"] < C.MIN_SPANS


def _is_inside(b1: dict, b2: dict) -> bool:
    # same-column required — see oracle._is_inside
    return (
        b1["col"] == b2["col"]
        and b1["start"] + C.INSIDE_TOL > b2["start"]
        and b1["end"] < b2["end"] + C.INSIDE_TOL
    )


def _same_size(b1: dict, b2: dict) -> bool:
    l1 = b1["end"] - b1["start"] + 1
    l2 = b2["end"] - b2["start"] + 1
    return max(l1, l2) * C.SAME_SIZE_NUM < min(l1, l2) * C.SAME_SIZE_DEN

"""Frozen pipeline constants, ported from the reference (SURVEY.md §7.4).

Every threshold is an integer or exact rational so the whole pipeline is
bit-exact (no float drift between the pure-Python oracle and the
vectorized Spark kernel).

Reference citations (semantics source, values re-scaled to the 1-D span
axis where the pixel-space magnitude does not transfer):

- GAP:              DBSCAN ``eps=3``            src/DocumentAnalyzer.py:71
- MIN_CHARS:        ``width < 75`` small rule   src/Postprocessing.py:27
- MIN_SPANS:        ``height < 25`` small rule  src/Postprocessing.py:27
                    (re-scaled: offsets advance ~1/span, 25 pixels ≈ 2 spans)
- INSIDE_TOL:       ``+10`` containment slack   src/Postprocessing.py:21
- MERGE_GAP:        ``y_treshold = 100``        src/prepare_data/merge_vertical_paragraphs.py:7,46
                    (re-scaled: 100 px ≈ 4 text lines ≈ 8 span offsets)
- SAME_SIZE_FACTOR: ``0.6`` length-ratio gate   src/prepare_data/merge_vertical_paragraphs.py:19
- MEDIA_CHAR_WEIGHT: figures are large in pixel space; a media span
  contributes a fixed char-equivalent so figure blocks survive MIN_CHARS.
"""

# --- grouping (G1/G2 analogs) ---
GAP = 3  # offset gap > GAP starts a new block
# --- small-block elimination (P4 analog) ---
MIN_CHARS = 75  # block with < 75 content chars dropped
MIN_SPANS = 2  # block with < 2 spans dropped
# --- containment elimination (P5 analog) ---
# re-scaled from 10 px: tolerance must stay small relative to typical block
# extent (10/75 px ratio); 2×GAP catches boundary fragments without
# swallowing real blocks. Containment additionally requires SAME COLUMN —
# the faithful 2-D analog (different columns have disjoint x-ranges, so the
# reference's is_inside can never fire across columns).
INSIDE_TOL = 6
# --- vertical merge (Q2 analog) ---
MERGE_GAP = 8  # inter-block offset gap < MERGE_GAP eligible to merge
SAME_SIZE_NUM = 3  # SAME_SIZE_FACTOR = 3/5 exactly (0.6), kept rational
SAME_SIZE_DEN = 5
# --- classifier ---
MEDIA_CHAR_WEIGHT = 100  # char-equivalent contribution of one media span
TITLE_MAX_CHARS = 80  # title-shaped: short ...
TITLE_CAP_RATIO_NUM = 1  # ... and > 1/2 of words capitalized
TITLE_CAP_RATIO_DEN = 2

# input kind vocabulary (FIXTURES.md §1.1)
KIND_TEXT = "text"
KIND_MEDIA = "media"
KIND_SEP = "sep"
BOILERPLATE_KINDS = ("nav", "ad", "foot", "script")

# output kind vocabulary
OUT_TITLE = "title"
OUT_PARAGRAPH = "paragraph"
OUT_FIGURE = "figure"
OUT_CAPTION = "caption"

# pixel-class analog (src/DocumentAnalyzer.py:52-59): 0=background/boilerplate,
# 1=content, 2=separator
CLS_BACKGROUND = 0
CLS_CONTENT = 1
CLS_SEPARATOR = 2

# DOM-heuristic boilerplate markers: a `text` span containing any of these
# lowercase substrings is stripped as boilerplate (class 0) even though its
# input kind is `text` (north_star: "DOM-heuristic boilerplate stripping").
BOILERPLATE_MARKERS = (
    "all rights reserved",
    "cookie policy",
    "subscribe to our newsletter",
    "terms of service",
    "privacy policy",
)

# caption-shaped text prefixes (lowercased comparison)
CAPTION_PREFIXES = ("figure ", "fig. ", "fig ")

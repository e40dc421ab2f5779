"""C1 seat: rule-based vectorized span classifier.

Replaces the reference's U-Net + softmax + argmax
(/root/reference/src/DocumentAnalyzer.py:44-59) with deterministic rules,
keeping only its *contract*: a 3-way class per element
{0 background/boilerplate, 1 content, 2 separator}, plus a content
sub-kind {title, paragraph, figure, caption}.

Everything here operates on whole flat batches with pandas string ops /
NumPy — no per-row Python (input_hint requirement). The rule tables are
module-level constants compiled once per executor (contrast: the
reference restores a TF session per image, src/DocumentAnalyzer.py:45-46).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from . import constants as C

# out-kind integer codes used inside the kernel
K_TITLE, K_PARAGRAPH, K_FIGURE, K_CAPTION = 0, 1, 2, 3
KIND_NAMES = np.array([C.OUT_TITLE, C.OUT_PARAGRAPH, C.OUT_FIGURE, C.OUT_CAPTION])

_BOILER_RE = re.compile("|".join(re.escape(m) for m in C.BOILERPLATE_MARKERS))
_CAPTION_RE = re.compile("^(?:" + "|".join(re.escape(p) for p in C.CAPTION_PREFIXES) + ")")
_ENDS_SENTENCE_RE = re.compile(r"[.!?]$")
_WORD_RE = re.compile(r"\S+")
_CAP_WORD_RE = re.compile(r"(?:^|\s)[A-Z]")


def classify_flat(kind: pd.Series, text: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Classify a flat batch of spans.

    Returns (cls int8 array, out_kind int8 array). out_kind is only
    meaningful where cls == 1.
    """
    n = len(kind)
    cls = np.zeros(n, dtype=np.int8)
    okind = np.full(n, K_PARAGRAPH, dtype=np.int8)

    kind_np = kind.to_numpy()
    is_sep = kind_np == C.KIND_SEP
    is_media = kind_np == C.KIND_MEDIA
    is_text = (kind_np == C.KIND_TEXT) & text.notna().to_numpy()

    cls[is_sep] = C.CLS_SEPARATOR
    cls[is_media] = C.CLS_CONTENT
    okind[is_media] = K_FIGURE

    if is_text.any():
        t = text[is_text].astype("object").astype(str)
        low = t.str.lower()
        boiler = low.str.contains(_BOILER_RE, regex=True).to_numpy()
        caption = low.str.match(_CAPTION_RE).to_numpy() & ~boiler
        title = (
            (t.str.len() <= C.TITLE_MAX_CHARS)
            & ~t.str.contains(_ENDS_SENTENCE_RE, regex=True)
            & (
                t.str.count(_CAP_WORD_RE.pattern) * C.TITLE_CAP_RATIO_DEN
                > t.str.count(_WORD_RE.pattern) * C.TITLE_CAP_RATIO_NUM
            )
        ).to_numpy() & ~boiler & ~caption

        sub_cls = np.where(boiler, C.CLS_BACKGROUND, C.CLS_CONTENT).astype(np.int8)
        sub_kind = np.where(
            caption, K_CAPTION, np.where(title, K_TITLE, K_PARAGRAPH)
        ).astype(np.int8)
        idx = np.flatnonzero(is_text)
        cls[idx] = sub_cls
        okind[idx] = sub_kind

    return cls, okind

"""Vectorized text-span transforms — docs/SPANS.md §2.1/§3.6.

Reference rules: keep-image prefix rewrite and strip-image regexes
(/root/reference/ocr_toolkit/processors/openocr_doc_handler.py:302-338),
block normalization (:255-257). All ops are pandas `.str` (C-level loops over
the whole batch), never per-row Python at the Spark layer.
"""

from __future__ import annotations

import pandas as pd


def rewrite_image_refs(s: pd.Series) -> pd.Series:
    """with_images=True: deterministic `imgs/` → `media/` prefix rewrite."""
    return (
        s.str.replace("](imgs/", "](media/", regex=False)
        .str.replace('src="imgs/', 'src="media/', regex=False)
        .str.replace("src='imgs/", "src='media/", regex=False)
    )


def strip_image_refs(s: pd.Series) -> pd.Series:
    """with_images=False: remove markdown/img-tag refs, collapse blank runs,
    strip (openocr_doc_handler.py:334-336)."""
    return (
        s.str.replace(r"!\[.*?\]\([^)]+\)", "", regex=True)
        .str.replace(r"(?i)<img[^>]*>", "", regex=True)
        .str.replace(r"\n{3,}", "\n\n", regex=True)
        .str.strip()
    )


def transform_text(s: pd.Series, with_images: bool) -> pd.Series:
    return rewrite_image_refs(s) if with_images else strip_image_refs(s)

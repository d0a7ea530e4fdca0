"""Page-selection spec parsing — reference semantics
(/root/reference/ocr_toolkit/utils/page_selection.py:20-68): comma-separated
1-based pages and inclusive ranges ("1-5,10,20-25"), deduplicated, sorted;
invalid syntax or an empty result raises ValueError."""

from __future__ import annotations


def parse_pages(spec: str) -> frozenset[int]:
    if spec is None or not str(spec).strip():
        raise ValueError("Empty page selection")
    pages: set[int] = set()
    for part in str(spec).split(","):
        part = part.strip()
        if not part:
            continue
        if "-" in part:
            lo_s, _, hi_s = part.partition("-")
            try:
                lo, hi = int(lo_s), int(hi_s)
            except ValueError:
                raise ValueError(f"Invalid page range: {part!r}")
            if lo < 1 or hi < lo:
                raise ValueError(f"Invalid page range: {part!r}")
            pages.update(range(lo, hi + 1))
        else:
            try:
                p = int(part)
            except ValueError:
                raise ValueError(f"Invalid page number: {part!r}")
            if p < 1:
                raise ValueError(f"Invalid page number: {part!r}")
            pages.add(p)
    if not pages:
        raise ValueError(f"No pages selected by: {spec!r}")
    return frozenset(pages)

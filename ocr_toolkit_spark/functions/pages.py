"""Page-selection spec parsing — reference semantics
(/root/reference/ocr_toolkit/utils/page_selection.py:20-68): comma-separated
1-based pages and inclusive ranges ("1-5,10,20-25"), deduplicated; reversed
ranges are normalized by swapping the bounds; a None/blank spec means "no
selection" (process all pages) and returns None; empty parts are skipped, so
a spec of only commas yields an empty selection (select zero pages), exactly
like the reference's `ParsedPages(indices=[])`."""

from __future__ import annotations


def parse_pages(spec: str | None) -> frozenset[int] | None:
    if spec is None:
        return None
    raw = str(spec).strip()
    if not raw:
        return None
    raw = raw.replace(" ", "")

    pages: set[int] = set()
    for part in raw.split(","):
        if not part:
            continue
        if "-" in part:
            lo_s, _, hi_s = part.partition("-")
            if not lo_s or not hi_s:
                raise ValueError(f"Invalid --pages range: '{part}'")
            start, end = int(lo_s), int(hi_s)  # int() raises on garbage
            if start <= 0 or end <= 0:
                raise ValueError("Page numbers must be >= 1")
            lo, hi = (start, end) if start <= end else (end, start)
            pages.update(range(lo, hi + 1))
        else:
            p = int(part)
            if p <= 0:
                raise ValueError("Page numbers must be >= 1")
            pages.add(p)
    return frozenset(pages)

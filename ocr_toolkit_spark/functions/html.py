"""DOM-heuristic HTML boilerplate strip — docs/SPANS.md §3.7 (from scratch).

Tag-density + link-text-ratio block scoring in the Arc90/boilerpipe family
(public algorithms). The reference delegates HTML to MarkItDown
(/root/reference/ocr_toolkit/config.py:60) — there is no reference parser;
the frozen spec in docs/SPANS.md is authoritative.

Implementation strategy (deliberately different from the oracle's object
state machine, for test independence): tokenize a document's markup into
event arrays, derive block ids / boiler depth / link state with NumPy
cumulative ops, then aggregate per block id.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_TAG_NAME_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9]*)")
_IMG_SRC_RE = re.compile(r"""src\s*=\s*(?:"([^"]*)"|'([^']*)')""", re.IGNORECASE)
_WS_RE = re.compile(r"\s+")

BLOCK_TAGS = frozenset(
    "p div section article main header footer nav aside ul ol li table tr "
    "h1 h2 h3 h4 h5 h6 blockquote br body html".split()
)
BOILER_CONTAINERS = frozenset({"nav", "footer", "aside", "header"})
_HEADING_LEVEL = {f"h{i}": i for i in range(1, 7)}

MIN_TEXT_LEN = 25
MAX_LINK_RATIO = 0.33
MAX_TAG_DENSITY = 0.34

_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
             ("&nbsp;", " "), ("&amp;", "&"))


def _norm(t: str) -> str:
    for ent, ch in _ENTITIES:  # &amp; decoded last — SPANS.md §3.7.5
        t = t.replace(ent, ch)
    return _WS_RE.sub(" ", t).strip()


@dataclass
class HtmlBlock:
    text: str
    heading_level: int
    img_srcs: list[str]
    kept: bool


def extract_blocks(html: str) -> list[HtmlBlock]:
    """Parse one document's HTML and score its blocks. Returns blocks in
    document order with the keep decision applied (SPANS.md §3.7.6-7)."""
    html = _COMMENT_RE.sub(" ", _STYLE_RE.sub(" ", _SCRIPT_RE.sub(" ", html)))

    tag_matches = list(_TAG_RE.finditer(html))
    n_tags = len(tag_matches)
    if n_tags == 0:
        t = _norm(html)
        if not t:
            return []
        kept = len(t) >= MIN_TEXT_LEN  # no tags → density 0, link ratio 0
        return [HtmlBlock(t, 0, [], kept)]

    names = np.empty(n_tags, dtype=object)
    closing = np.zeros(n_tags, dtype=bool)
    selfclose = np.zeros(n_tags, dtype=bool)
    for i, m in enumerate(tag_matches):
        tag = m.group(0)
        nm = _TAG_NAME_RE.match(tag)
        names[i] = nm.group(1).lower() if nm else ""
        closing[i] = tag.startswith("</")
        selfclose[i] = tag.endswith("/>")

    is_block = np.array([nm in BLOCK_TAGS for nm in names], dtype=bool)
    # block id in effect AFTER event i = number of block-tag events in [0..i]
    block_after = np.cumsum(is_block)
    n_blocks = int(block_after[-1]) + 1

    # boiler depth after each event (clamped-at-zero running sum; the clamp
    # only matters for unbalanced hostile markup, so loop over deltas only)
    is_boiler_tag = np.array([nm in BOILER_CONTAINERS for nm in names], dtype=bool)
    delta = np.where(is_boiler_tag & ~closing & ~selfclose, 1,
                     np.where(is_boiler_tag & closing, -1, 0))
    depth_after = np.zeros(n_tags, dtype=np.int64)
    nz = np.nonzero(delta)[0]
    d = 0
    prev_i = 0
    for i in nz:
        depth_after[prev_i:i] = d
        d = max(0, d + int(delta[i]))
        prev_i = i
    depth_after[prev_i:] = d
    # depth_after[i] = clamped boiler depth after event i

    # link state after each event: toggle on <a>/</a> (last-event-wins)
    is_a = names == "a"
    link_state_after = np.zeros(n_tags, dtype=bool)
    if is_a.any():
        a_idx = np.nonzero(is_a)[0]
        state = ~closing[a_idx]  # open → True, close → False
        # forward-fill between a-events
        cur = False
        j = 0
        for i in range(n_tags):
            if j < len(a_idx) and a_idx[j] == i:
                cur = bool(state[j])
                j += 1
            link_state_after[i] = cur

    # per-block attributes
    blk_level = np.zeros(n_blocks, dtype=np.int64)
    blk_boiler = np.zeros(n_blocks, dtype=bool)
    blk_tagcount = np.zeros(n_blocks, dtype=np.int64)
    blk_imgs: list[list[str]] = [[] for _ in range(n_blocks)]
    for i in range(n_tags):
        if is_block[i]:
            b = int(block_after[i])  # the block this event OPENS
            if not closing[i]:
                blk_level[b] = _HEADING_LEVEL.get(names[i], 0)
            blk_boiler[b] = depth_after[i] > 0
        else:
            b = int(block_after[i - 1]) if i > 0 else 0
            blk_tagcount[b] += 1
            if names[i] == "img" and not closing[i]:
                sm = _IMG_SRC_RE.search(tag_matches[i].group(0))
                if sm:
                    blk_imgs[b].append(sm.group(1) or sm.group(2) or "")

    # text runs: run before event i belongs to block_after[i-1] (block 0 for
    # i=0); tail run after the last event belongs to the final block
    blk_parts: list[list[str]] = [[] for _ in range(n_blocks)]
    blk_linklen = np.zeros(n_blocks, dtype=np.int64)
    pos = 0
    for i, m in enumerate(tag_matches):
        run = html[pos:m.start()]
        pos = m.end()
        if run:
            b = int(block_after[i - 1]) if i > 0 else 0
            blk_parts[b].append(run)
            in_link = link_state_after[i - 1] if i > 0 else False
            if in_link:
                blk_linklen[b] += len(_norm(run))
    tail = html[pos:]
    if tail:
        blk_parts[-1].append(tail)
        if link_state_after[-1]:
            blk_linklen[-1] += len(_norm(tail))

    out: list[HtmlBlock] = []
    for b in range(n_blocks):
        text = _norm("".join(blk_parts[b]))
        level = int(blk_level[b])
        kept = _keep(text, int(blk_tagcount[b]), int(blk_linklen[b]), level,
                     bool(blk_boiler[b]))
        out.append(HtmlBlock(text, level, blk_imgs[b], kept))
    return out


def _keep(text: str, tag_count: int, link_len: int, level: int, boiler: bool) -> bool:
    if boiler or not text:
        return False
    if level > 0:
        return True
    tl = len(text)
    if tl < MIN_TEXT_LEN:
        return False
    if link_len / tl > MAX_LINK_RATIO:
        return False
    return tag_count / max(len(text.split()), 1) <= MAX_TAG_DENSITY

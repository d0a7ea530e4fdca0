"""DOM-heuristic HTML boilerplate strip — docs/SPANS.md §3.7 (from scratch).

Tag-density + link-text-ratio block scoring in the Arc90/boilerpipe family
(public algorithms). The reference delegates HTML to MarkItDown
(/root/reference/ocr_toolkit/config.py:60) — there is no reference parser;
the frozen spec in docs/SPANS.md is authoritative.

Implementation (deliberately different from the oracle's object state machine,
for test independence): ONE `re.split` tokenization into alternating
text/tag runs, then a single linear pass with flat accumulator lists — no
per-tag match objects, no per-block objects until the end. Measured ~2× the
oracle's tokenizer; this function is the hottest Python in the extraction
kernel (HTML is the one format that resists columnar vectorization).
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass


class HtmlBudgetExceeded(Exception):
    """Cooperative preemption: extract_blocks crossed its deadline.

    Raised mid-parse (not check-after) so a pathological document costs
    ~its budget, not its full parse time — the in-process analog of the
    reference's per-file subprocess timeout (cli/benchmark.py:45)."""


_DEADLINE_STRIDE = 4096  # tokens between clock checks (~µs granularity)

_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_SPLIT_RE = re.compile(r"(<[^>]+>)")
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
        if ent in t:
            t = t.replace(ent, ch)
    return _WS_RE.sub(" ", t).strip()


@dataclass
class HtmlBlock:
    text: str
    heading_level: int
    img_srcs: list[str]
    kept: bool


def extract_blocks(html: str, deadline: float | None = None) -> list[HtmlBlock]:
    """Parse one document's HTML and score its blocks. Returns blocks in
    document order with the keep decision applied (SPANS.md §3.7.6-7).

    `deadline` (absolute time.perf_counter() value) enables cooperative
    preemption: the token and scoring loops check the clock every
    _DEADLINE_STRIDE iterations and raise HtmlBudgetExceeded mid-parse.
    The C-level regex pre-passes (script/style/comment strip, tokenize)
    run before the first check — they are linear scans, so the unbounded
    super-linear work (the Python block loop) is what the deadline
    bounds."""
    html = _COMMENT_RE.sub(" ", _STYLE_RE.sub(" ", _SCRIPT_RE.sub(" ", html)))

    parts = _SPLIT_RE.split(html)  # even idx: text runs, odd idx: tags
    if deadline is not None and time.perf_counter() > deadline:
        raise HtmlBudgetExceeded

    # parallel per-block accumulators
    texts: list[list[str]] = [[]]
    tag_count = [0]
    link_len = [0]
    level = [0]
    boiler = [False]
    imgs: list[list[str]] = [[]]

    depth = 0
    in_link = False

    for i, tok in enumerate(parts):
        if (
            deadline is not None
            and i % _DEADLINE_STRIDE == 0
            and time.perf_counter() > deadline
        ):
            raise HtmlBudgetExceeded
        if i & 1:  # tag token
            # manual tag-name scan (≡ regex `</?\s*([a-zA-Z][a-zA-Z0-9]*)`,
            # measured ~2× faster than per-token re.match)
            closing = tok.startswith("</")
            j = 2 if closing else 1
            n_tok = len(tok)
            # str.isspace(), not an ASCII set: Python's regex \s (the
            # oracle's _TAG_NAME_RE) also skips U+001C-001F and Unicode
            # spaces before the tag name — '<\x1fp>' IS a <p> tag
            while j < n_tok and tok[j].isspace():
                j += 1
            k = j
            if k < n_tok and tok[k].isascii() and tok[k].isalpha():
                k += 1
                while k < n_tok and tok[k].isascii() and tok[k].isalnum():
                    k += 1
                name = tok[j:k].lower()
            else:
                # unnamed token (<?pi?>, <!DOCTYPE>, <123>): not a tag —
                # must NOT count toward tag density (oracle.py skips these)
                continue
            if name in BLOCK_TAGS:
                if name in BOILER_CONTAINERS:
                    if closing:
                        depth = max(0, depth - 1)
                    elif not tok.endswith("/>"):
                        depth += 1
                texts.append([])
                tag_count.append(0)
                link_len.append(0)
                level.append(0 if closing else _HEADING_LEVEL.get(name, 0))
                boiler.append(depth > 0)
                imgs.append([])
            else:
                if name == "a":
                    in_link = not closing
                elif name == "img" and not closing:
                    sm = _IMG_SRC_RE.search(tok)
                    if sm:
                        imgs[-1].append(sm.group(1) or sm.group(2) or "")
                tag_count[-1] += 1
        elif tok:  # text run
            texts[-1].append(tok)
            if in_link:
                link_len[-1] += len(_norm(tok))

    out: list[HtmlBlock] = []
    for b in range(len(texts)):
        if (
            deadline is not None
            and b % _DEADLINE_STRIDE == 0
            and time.perf_counter() > deadline
        ):
            raise HtmlBudgetExceeded
        t = _norm("".join(texts[b]))
        lv = level[b]
        kept = _keep(t, tag_count[b], link_len[b], lv, boiler[b])
        out.append(HtmlBlock(t, lv, imgs[b], kept))
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

"""Single-node pure-Python oracle for the extraction semantics.

Implements docs/SPANS.md verbatim, one document at a time, in the most
straightforward Python possible. This is the GROUND TRUTH the Spark engine
(`operators/extract.py`, an independent vectorized implementation) is tested
against on `(kind, text, media_ref, order)` span-sequence equality — the test
strategy in SURVEY.md §5.

Each rule carries a citation of the reference behavior it restates:
reference = /root/reference (Oxidane-bot/ocr-toolkit).
Never used on the Spark hot path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# --- dispatch --------------------------------------------------------------

KNOWN_KINDS = {"text", "heading", "html", "image", "table_row", "page_break", "bytes"}

_MD_HEADER_RE = re.compile(r"^#{1,6} ")
# image strip rules: openocr_doc_handler.py:334-336
_MD_IMG_RE = re.compile(r"!\[.*?\]\([^)]+\)")
_HTML_IMG_RE = re.compile(r"<img[^>]*>", re.IGNORECASE)
_MULTI_NL_RE = re.compile(r"\n{3,}")


@dataclass
class OutSpan:
    kind: str
    text: str
    media_ref: str
    order: int


@dataclass
class ExtractResult:
    doc_id: str
    out_spans: list[OutSpan]
    success: bool
    error: str
    method: str

    @property
    def n_spans(self) -> int:
        return len(self.out_spans)

    @property
    def n_chars(self) -> int:
        return sum(len(s.text) for s in self.out_spans)


def _norm_span(s: dict) -> dict:
    return {
        "kind": s.get("kind") or "",
        "text": s.get("text") if s.get("text") is not None else "",
        "media_ref": s.get("media_ref") if s.get("media_ref") is not None else "",
        "offset": s.get("offset") if s.get("offset") is not None else 0,
    }


def sniff_format(spans: list[dict] | None) -> str:
    """Content-sniffing dispatch — SPANS.md §1 (reference: extension dispatch
    cli/convert.py:380-445; north_star upgrades to content sniffing)."""
    if not spans:
        return "error"
    kinds = {(s.get("kind") or "") for s in spans}
    if "html" in kinds:
        return "html"
    if "table_row" in kinds:
        return "sheet"
    if "page_break" in kinds:
        return "paged"
    if "bytes" in kinds:
        return "bytes_text"
    if kinds & {"text", "heading"}:
        for s in sorted(
            (_norm_span(x) for x in spans), key=lambda d: d["offset"]
        ):  # stable
            if s["kind"] in ("text", "heading") and s["text"].strip():
                if _MD_HEADER_RE.match(s["text"].strip()):
                    return "markdown"
                return "text"
        return "text"
    if kinds & KNOWN_KINDS:
        return "text"  # only image/known-media kinds → text route, emits nothing
    return "error"


# --- shared helpers ---------------------------------------------------------


class _Emitter:
    def __init__(self) -> None:
        self.spans: list[OutSpan] = []

    def emit(self, kind: str, text: str, media_ref: str = "") -> None:
        self.spans.append(OutSpan(kind, text, media_ref, len(self.spans)))

    def emit_block(self, kind: str, text: str) -> None:
        """Block normalization — SPANS.md §2.1 (strip; drop if empty;
        reference: openocr_doc_handler.py:255-257)."""
        t = text.strip()
        if t:
            self.emit(kind, t)


def _sorted_spans(spans: list[dict]) -> list[dict]:
    norm = [_norm_span(s) for s in spans]
    return sorted(norm, key=lambda d: d["offset"])  # Python sort is stable


def _rewrite_image_refs(text: str) -> str:
    """with_images=True inline prefix rewrite — SPANS.md §3.6 (deterministic
    substitute for the imgs_{epoch_ms} rename, openocr_doc_handler.py:311-328)."""
    text = text.replace("](imgs/", "](media/")
    text = text.replace('src="imgs/', 'src="media/')
    text = text.replace("src='imgs/", "src='media/")
    return text


def _strip_image_refs(text: str) -> str:
    """with_images=False strip — openocr_doc_handler.py:334-336."""
    text = _MD_IMG_RE.sub("", text)
    text = _HTML_IMG_RE.sub("", text)
    text = _MULTI_NL_RE.sub("\n\n", text).strip()
    return text


def _text_span_content(text: str, with_images: bool) -> str:
    return _rewrite_image_refs(text) if with_images else _strip_image_refs(text)


# --- format handlers ---------------------------------------------------------


def _extract_text(doc_id: str, spans: list[dict], em: _Emitter, with_images: bool) -> None:
    """SPANS.md §3.1 — `# {filename}\\n\\n{content}` wrap
    (text_file_processor.py:104-122)."""
    em.emit("heading", f"# {doc_id}")
    for s in _sorted_spans(spans):
        if s["kind"] in ("text", "heading"):
            em.emit_block("text", _text_span_content(s["text"], with_images))


def _extract_markdown(doc_id: str, spans: list[dict], em: _Emitter, with_images: bool) -> None:
    """SPANS.md §3.2 — verbatim passthrough (text_file_processor.py:117-118),
    blocks classified heading/text."""
    for s in _sorted_spans(spans):
        if s["kind"] in ("text", "heading"):
            t = _text_span_content(s["text"], with_images).strip()
            if not t:
                continue
            kind = "heading" if _MD_HEADER_RE.match(t) else "text"
            em.emit(kind, t)


def _decode_bytes(hex_text: str) -> str:
    """UTF-8 → GBK fallback — text_file_processor.py:70-78."""
    raw = bytes.fromhex(hex_text.strip())
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("gbk")  # may raise → doc-level error


def _extract_bytes_text(doc_id: str, spans: list[dict], em: _Emitter, with_images: bool) -> None:
    """SPANS.md §3.3 — decode then the `text` rule."""
    em.emit("heading", f"# {doc_id}")
    for s in _sorted_spans(spans):
        if s["kind"] == "bytes":
            try:
                decoded = _decode_bytes(s["text"])
            except (UnicodeDecodeError, ValueError) as exc:
                raise _DocError("decode error: not utf-8 or gbk") from exc
            em.emit_block("text", _text_span_content(decoded, with_images))
        elif s["kind"] in ("text", "heading"):
            em.emit_block("text", _text_span_content(s["text"], with_images))


def _extract_paged(doc_id: str, spans: list[dict], em: _Emitter, with_images: bool,
                   selected: frozenset[int] | None = None) -> None:
    """SPANS.md §3.4 — `## Page {n}` headers + reading-order assembly
    (openocr_doc_handler.py:208-224, 241-276); page selection §3.4.1
    (page_selection.py:20-68, clamp openocr_doc_handler.py:186-193)."""
    pages: list[list[dict]] = [[]]
    for s in _sorted_spans(spans):
        if s["kind"] == "page_break":
            pages.append([])
        else:
            pages[-1].append(s)
    if selected is not None:
        if not (selected & set(range(1, len(pages) + 1))):
            raise _DocError("no valid pages selected")
    for page_no, page in enumerate(pages, start=1):
        if selected is not None and page_no not in selected:
            continue
        staged: list[OutSpan] = []
        sub = _Emitter()
        for s in page:
            if s["kind"] == "heading":
                sub.emit_block("heading", s["text"])
            elif s["kind"] == "text":
                sub.emit_block("text", _text_span_content(s["text"], with_images))
            elif s["kind"] == "image" and with_images:
                sub.emit("image", "", s["media_ref"])
        staged = sub.spans
        if staged:  # empty pages emit nothing, not even the header
            em.emit("heading", f"## Page {page_no}")
            for sp in staged:
                em.emit(sp.kind, sp.text, sp.media_ref)


# cell formatting — SPANS.md §3.5 / excel_processor.py:206-242
_INT_RE = re.compile(r"^[+-]?\d+$")
_FLOAT_RE = re.compile(r"^[+-]?(\d+\.\d*|\.\d+|\d+\.)([eE][+-]?\d+)?$|^[+-]?\d+[eE][+-]?\d+$")
_ISO_DT_RE = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}$")


def format_cell(raw: str) -> str:
    if raw == "":
        return ""
    if _ISO_DT_RE.match(raw):
        return raw.replace("T", " ")
    if _INT_RE.match(raw):
        return raw
    if _FLOAT_RE.match(raw):
        x = float(raw)
        if x == int(x):
            return str(int(x))
        return f"{x:.2f}"
    out = raw.replace("|", "\\|")
    if len(out) > 100:
        out = out[:97] + "..."
    return out


def _extract_sheet(doc_id: str, spans: list[dict], em: _Emitter, with_images: bool) -> None:
    """SPANS.md §3.5 — sheet→markdown tables (excel_processor.py:115-204)."""
    em.emit("heading", f"# {doc_id}")
    sheets: list[tuple[str, list[list[str]]]] = []
    current: tuple[str, list[list[str]]] | None = None
    for s in _sorted_spans(spans):
        if s["kind"] == "heading":
            if current is not None:
                sheets.append(current)
            current = (s["text"].strip() or "Sheet", [])
        elif s["kind"] == "table_row":
            if current is None:
                current = ("Sheet1", [])
            current[1].append(s["text"].split("\x1f"))
    if current is not None:
        sheets.append(current)
    for name, rows in sheets:
        em.emit("heading", f"## Sheet: {name}")
        if not rows:
            em.emit("text", "*(Empty sheet)*")
            continue
        max_cols = max(len(r) for r in rows)
        lines: list[str] = []
        for i, row in enumerate(rows):
            cells = [format_cell(c) for c in row] + [""] * (max_cols - len(row))
            lines.append("| " + " | ".join(cells) + " |")
            if i == 0:
                lines.append("| " + " | ".join(["---"] * max_cols) + " |")
        em.emit("table", "\n".join(lines))


# --- html boilerplate strip — SPANS.md §3.7 (from scratch; north_star) --------

_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_TAG_NAME_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9]*)")
_IMG_SRC_RE = re.compile(r"""src\s*=\s*(?:"([^"]*)"|'([^']*)')""", re.IGNORECASE)
_WS_RE = re.compile(r"\s+")

BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "header", "footer", "nav", "aside",
    "ul", "ol", "li", "table", "tr", "h1", "h2", "h3", "h4", "h5", "h6",
    "blockquote", "br", "body", "html",
}
BOILER_CONTAINERS = {"nav", "footer", "aside", "header"}
HEADING_TAGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}


def _decode_entities(t: str) -> str:
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
        ("&nbsp;", " "), ("&amp;", "&"),  # &amp; last — SPANS.md §3.7.5
    ):
        t = t.replace(ent, ch)
    return t


@dataclass
class _Block:
    text_parts: list[str]
    tag_count: int = 0
    link_text_len: int = 0
    heading_level: int = 0
    in_boiler: bool = False
    img_srcs: list[str] | None = None

    def text(self) -> str:
        joined = "".join(self.text_parts)
        return _WS_RE.sub(" ", _decode_entities(joined)).strip()


def html_blocks(html: str) -> list[_Block]:
    """Tokenize → segment → score inputs. Deterministic per SPANS.md §3.7."""
    html = _SCRIPT_RE.sub(" ", html)
    html = _STYLE_RE.sub(" ", html)
    html = _COMMENT_RE.sub(" ", html)

    blocks: list[_Block] = []
    boiler_depth = 0
    in_link = False

    def new_block(level: int = 0) -> _Block:
        b = _Block(text_parts=[], heading_level=level, in_boiler=boiler_depth > 0,
                   img_srcs=[])
        blocks.append(b)
        return b

    cur = new_block()
    pos = 0
    for m in _TAG_RE.finditer(html):
        text_run = html[pos:m.start()]
        if text_run:
            cur.text_parts.append(text_run)
            if in_link:
                cur.link_text_len += len(_WS_RE.sub(" ", _decode_entities(text_run)).strip())
        pos = m.end()
        tag = m.group(0)
        nm = _TAG_NAME_RE.match(tag)
        if not nm:
            continue
        name = nm.group(1).lower()
        closing = tag.startswith("</")
        if name in BLOCK_TAGS:
            if name in BOILER_CONTAINERS:
                if closing:
                    boiler_depth = max(0, boiler_depth - 1)
                elif not tag.endswith("/>"):
                    boiler_depth += 1
            level = 0 if closing else HEADING_TAGS.get(name, 0)
            cur = new_block(level)
        else:
            if name == "a":
                in_link = not closing
            if name == "img" and not closing:
                srcm = _IMG_SRC_RE.search(tag)
                if srcm:
                    cur.img_srcs.append(srcm.group(1) or srcm.group(2) or "")
            cur.tag_count += 1
    tail = html[pos:]
    if tail:
        cur.text_parts.append(tail)
        if in_link:
            cur.link_text_len += len(_WS_RE.sub(" ", _decode_entities(tail)).strip())
    return blocks


def keep_block(text: str, tag_count: int, link_text_len: int,
               heading_level: int, in_boiler: bool) -> bool:
    """Block-scoring keep rule — SPANS.md §3.7.6-7."""
    if in_boiler or not text:
        return False
    if heading_level > 0:
        return True
    text_len = len(text)
    if text_len < 25:
        return False
    link_ratio = link_text_len / text_len
    word_count = len(text.split())
    tag_density = tag_count / max(word_count, 1)
    return link_ratio <= 0.33 and tag_density <= 0.34


def _extract_html(doc_id: str, spans: list[dict], em: _Emitter, with_images: bool) -> None:
    html = "\n".join(
        s["text"] for s in _sorted_spans(spans) if s["kind"] == "html"
    )
    for b in html_blocks(html):
        t = b.text()
        if not keep_block(t, b.tag_count, b.link_text_len, b.heading_level, b.in_boiler):
            continue
        if b.heading_level > 0:
            em.emit("heading", "#" * b.heading_level + " " + t)
        else:
            em.emit("text", t)
        if with_images:
            for src in b.img_srcs or []:
                em.emit("image", "", src)


# --- driver -------------------------------------------------------------------


class _DocError(Exception):
    pass


_HANDLERS = {
    "text": _extract_text,
    "markdown": _extract_markdown,
    "bytes_text": _extract_bytes_text,
    "paged": _extract_paged,
    "sheet": _extract_sheet,
    "html": _extract_html,
}


def extract_document(doc_id: str, spans: list[dict] | None,
                     with_images: bool = True,
                     pages: frozenset[int] | None = None) -> ExtractResult:
    """Extract ONE document per SPANS.md. Never raises — per-doc failure
    containment (ocr_processor_wrapper.py:135-149). `pages` applies only to
    paged docs (SPANS.md §3.4.1)."""
    fmt = sniff_format(spans)
    if fmt == "error":
        err = (
            "empty document: no spans"
            if not spans
            else "unsupported content: no known span kinds"
        )
        return ExtractResult(doc_id, [], False, err, "error")
    em = _Emitter()
    try:
        if fmt == "paged":
            _extract_paged(doc_id, list(spans or []), em, with_images, pages)
        else:
            _HANDLERS[fmt](doc_id, list(spans or []), em, with_images)
    except _DocError as exc:
        return ExtractResult(doc_id, [], False, str(exc), fmt)
    except Exception as exc:  # containment: any bug → error row, not task kill
        return ExtractResult(doc_id, [], False, f"{type(exc).__name__}: {exc}", fmt)
    return ExtractResult(doc_id, em.spans, True, "", fmt)


def extract_corpus(docs: list[tuple[str, list[dict] | None]],
                   with_images: bool = True,
                   pages: frozenset[int] | None = None) -> list[ExtractResult]:
    return [extract_document(d, s, with_images, pages) for d, s in docs]


# --- quality scoring (T10) — SPANS.md §4 / quality_evaluator.py:46-126 --------

_HDR_RE = re.compile(r"^#+\s", re.MULTILINE)
_LIST_RE = re.compile(r"^[-*•]\s|^\d+\.\s", re.MULTILINE)
_PARA_RE = re.compile(r"\n\s*\n")
_REPEAT_RE = re.compile(r"(.)\1{4,}")
_SPECIAL_RE = re.compile(r'[^\w\s\n.,!?;:()\[\]{}""' "-]")
_WORD_RE = re.compile(r"\b\w+\b")


def quality_score(text: str) -> dict[str, float]:
    if not text or not text.strip():
        return {"length_score": 0.0, "structure_score": 0.0, "diversity_score": 0.0,
                "error_penalty": 1.0, "total_score": 0.0}
    t = text.strip()
    length_score = min(len(t) / 1000, 10) * 10
    structure = 0.0
    structure += min(len(_HDR_RE.findall(t)) * 5, 30)
    structure += min(len(_LIST_RE.findall(t)) * 2, 20)
    structure += min(len(_PARA_RE.split(t)) * 1, 20)
    structure += min(len([ln for ln in t.split("\n") if ln.strip()]) * 0.5, 30)
    structure_score = min(structure, 100)
    unique_chars = len(set(t.lower().replace(" ", "").replace("\n", "")))
    diversity_score = min(unique_chars * 2, 100)
    penalty = 1.0
    if _REPEAT_RE.search(t):
        penalty *= 0.8
    if len(_SPECIAL_RE.findall(t)) / len(t) > 0.05:
        penalty *= 0.9
    words = _WORD_RE.findall(t)
    if words and sum(1 for w in words if len(w) == 1) / len(words) > 0.3:
        penalty *= 0.7
    total = (0.3 * length_score + 0.4 * structure_score + 0.3 * diversity_score) * penalty
    return {"length_score": length_score, "structure_score": structure_score,
            "diversity_score": diversity_score, "error_penalty": penalty,
            "total_score": total}


def render_markdown(result: ExtractResult) -> str:
    """`\\n\\n` join of non-image span texts (openocr_doc_handler.py:276)."""
    return "\n\n".join(s.text for s in result.out_spans if s.kind != "image")

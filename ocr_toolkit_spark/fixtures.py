"""Deterministic fixture corpus generator — the `input_hint` documents table.

Synthesizes the interleaved text+media span corpus (FIXTURES.md §1) with a
fixed seed and zero wall-clock dependence. Slices map 1:1 to reference rule
families (citations in FIXTURES.md). Generation is plain Python/pyarrow — the
corpus is an INPUT; Spark never generates data on the hot path.

The reference's own fixtures are real files (`testFile/dummy.*`) plus golden
markdown under `tests/output/`; we reproduce those *shapes* synthetically,
e.g. the text+`<img>` interleaving of `tests/output/test_with_images/2.md`.
"""

from __future__ import annotations

import hashlib
import random

import pyarrow as pa
import pyarrow.parquet as pq

WORDS = (
    "spark arrow batch span document extract layout reading order block "
    "heading table image page markdown content boiler main nav footer link "
    "density ratio quality score method partition shuffle salt lineage resume "
    "snapshot commit vector token shingle hash bucket join scan filter"
).split()

CJK = "文档内容提取质量评分布局阅读顺序表格图像页面标记"

_SPAN_FIELDS = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)
DOCS_ARROW_SCHEMA = pa.schema(
    [pa.field("doc_id", pa.string()), pa.field("spans", pa.list_(_SPAN_FIELDS))]
)


def _sha8(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()[:8]


class _SentencePool:
    """Pre-generated sentence pool so corpus generation is O(pool) string
    joins instead of O(total spans) — large-corpus generation for BENCH was
    measured to be join-bound. Sampling stays seed-deterministic."""

    def __init__(self, rng: random.Random, size: int = 4096) -> None:
        self.plain = [
            " ".join(rng.choice(WORDS) for _ in range(rng.randint(3, 30)))
            for _ in range(size)
        ]
        self.cjk = [
            p + " " + "".join(rng.choice(CJK) for _ in range(rng.randint(2, 8)))
            for p in self.plain[: size // 4]
        ]

    def sentence(self, rng: random.Random, n: int, cjk: bool = False) -> str:
        if cjk:
            return self.cjk[rng.randrange(len(self.cjk))]
        if n <= 6:
            # short sentences stay bespoke (cell payloads, sheet names)
            return " ".join(rng.choice(WORDS) for _ in range(n))
        return self.plain[rng.randrange(len(self.plain))]


_POOL: _SentencePool | None = None


def _sentence(rng: random.Random, n: int, cjk: bool = False) -> str:
    return _POOL.sentence(rng, n, cjk) if _POOL else " ".join(
        rng.choice(WORDS) for _ in range(n)
    )


def _span(kind: str, text: str = "", media_ref: str = "", offset: int = 0) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


# --- slice generators (each returns list[span]) -------------------------------


def _gen_plain_text(rng: random.Random) -> list[dict]:
    n = rng.randint(1, 12)
    spans = []
    for i in range(n):
        txt = _sentence(rng, rng.randint(3, 30), cjk=rng.random() < 0.3)
        if rng.random() < 0.1:
            txt = "   " + txt + "  \n"  # exercises strip normalization
        if rng.random() < 0.05:
            txt = ""  # empty block → dropped
        spans.append(_span("text", txt, offset=i * 10))
    return spans


def _gen_gbk_bytes(rng: random.Random) -> list[dict]:
    """UTF-8→GBK fallback slice. 1 in 8 docs is undecodable by both → error."""
    spans = []
    for i in range(rng.randint(1, 4)):
        roll = rng.random()
        if roll < 0.4:
            payload = _sentence(rng, 8, cjk=True).encode("utf-8")
        elif roll < 0.875:
            payload = ("中文" + _sentence(rng, 5)).encode("gbk")
        else:
            payload = bytes([0xFF, 0xFE, 0x81, 0x40, 0xFF, 0xFF])  # bad both ways
        spans.append(_span("bytes", payload.hex(), offset=i * 10))
    if rng.random() < 0.3:
        spans.append(_span("text", _sentence(rng, 6), offset=1000))
    return spans


def _gen_markdown(rng: random.Random) -> list[dict]:
    spans = [_span("text", f"# {_sentence(rng, 3)}", offset=0)]
    for i in range(1, rng.randint(2, 10)):
        if rng.random() < 0.3:
            lvl = rng.randint(2, 4)
            spans.append(_span("text", "#" * lvl + " " + _sentence(rng, 4), offset=i * 10))
        else:
            spans.append(_span("text", _sentence(rng, 15), offset=i * 10))
    return spans


def _gen_paged(rng: random.Random, doc_id: str) -> list[dict]:
    spans: list[dict] = []
    off = 0
    n_pages = rng.randint(1, 6)
    for p in range(n_pages):
        if p > 0:
            spans.append(_span("page_break", offset=off))
            off += 1
        n_blocks = rng.randint(0, 6)  # 0 → empty page (skipped per spec)
        for b in range(n_blocks):
            roll = rng.random()
            if roll < 0.15:
                spans.append(_span("heading", f"## {_sentence(rng, 3)}", offset=off))
            elif roll < 0.35:
                ref = f"img_{_sha8(doc_id + str(off))}.jpg"
                spans.append(_span("image", "", ref, offset=off))
            elif roll < 0.45:
                # inline image markdown inside text → prefix-rewrite rule
                spans.append(
                    _span(
                        "text",
                        f'{_sentence(rng, 6)} <img src="imgs/{_sha8(doc_id)}.png"> '
                        f"![fig](imgs/{_sha8(str(off))}.jpg) {_sentence(rng, 4)}",
                        offset=off,
                    )
                )
            else:
                spans.append(_span("text", _sentence(rng, rng.randint(5, 40)), offset=off))
            off += 1
    # shuffle array order; duplicate some offsets — reading order must come
    # from (offset, array position) stable sort, never array order alone
    if rng.random() < 0.5:
        rng.shuffle(spans)
    return spans


def _gen_sheet(rng: random.Random) -> list[dict]:
    spans: list[dict] = []
    off = 0
    n_sheets = rng.randint(1, 3)
    for s in range(n_sheets):
        if s > 0 or rng.random() < 0.7:
            spans.append(_span("heading", f"Data{s}", offset=off))
            off += 1
        n_rows = rng.randint(0, 8)  # 0 rows → *(Empty sheet)*
        n_cols = rng.randint(1, 5)
        for r in range(n_rows):
            cells = []
            for c in range(n_cols if rng.random() < 0.8 else rng.randint(1, n_cols)):
                roll = rng.random()
                if roll < 0.1:
                    cells.append("")
                elif roll < 0.2:
                    cells.append(f"2024-{rng.randint(1,12):02d}-{rng.randint(1,28):02d}"
                                 f"T{rng.randint(0,23):02d}:{rng.randint(0,59):02d}:00")
                elif roll < 0.35:
                    cells.append(str(rng.randint(-5000, 5000)))
                elif roll < 0.45:
                    cells.append(f"{rng.uniform(-100, 100):.4f}")
                elif roll < 0.5:
                    cells.append(f"{float(rng.randint(1, 99))}")  # whole float
                elif roll < 0.55:
                    cells.append("a|b|" + _sentence(rng, 2))  # pipe escape
                elif roll < 0.6:
                    cells.append(_sentence(rng, 40))  # >100 chars → truncate
                else:
                    cells.append(_sentence(rng, rng.randint(1, 4)))
            spans.append(_span("table_row", "\x1f".join(cells), offset=off))
            off += 1
    return spans


_BOILER_NAV = (
    '<nav><ul><li><a href="/">home</a></li><li><a href="/a">archive</a></li>'
    '<li><a href="/c">contact</a></li></ul></nav>'
)
_BOILER_FOOTER = (
    '<footer><p>copyright 2024 <a href="/t">terms</a> <a href="/p">privacy</a>'
    "</p></footer>"
)


def _gen_html(rng: random.Random, doc_id: str) -> list[dict]:
    parts = ["<html><body>", _BOILER_NAV]
    parts.append('<div class="sidebar"><p><a href="/1">one</a> <a href="/2">two</a> '
                 '<a href="/3">three</a> <a href="/4">four</a></p></div>')
    parts.append(f"<h1>{_sentence(rng, 4)}</h1>")
    for i in range(rng.randint(1, 6)):
        if rng.random() < 0.25:
            parts.append(f"<h2>{_sentence(rng, 3)}</h2>")
        body = _sentence(rng, rng.randint(8, 60))
        if rng.random() < 0.3:
            body += f' see <a href="/x{i}">{_sentence(rng, 2)}</a> for more'
        if rng.random() < 0.25:
            body += f' <img src="img_{_sha8(doc_id + str(i))}.jpg" alt="f">'
        if rng.random() < 0.2:
            body = body.replace(" ", " &amp; ", 1)
        parts.append(f"<p>{body}</p>")
    if rng.random() < 0.4:
        parts.append("<script>var x = 1 < 2; document.write('junk');</script>")
    if rng.random() < 0.3:
        parts.append("<!-- hidden comment boilerplate -->")
    parts.append('<p><a href="/m1">more</a> <a href="/m2">links</a> '
                 '<a href="/m3">only</a></p>')  # link farm → dropped
    parts.append(_BOILER_FOOTER)
    parts.append("</body></html>")
    html = "".join(parts)
    if rng.random() < 0.3:  # multi-span html doc
        cut = len(html) // 2
        return [_span("html", html[:cut], offset=0), _span("html", html[cut:], offset=1)]
    return [_span("html", html, offset=0)]


def _gen_skewed(rng: random.Random, doc_id: str) -> list[dict]:
    """~10^3× median span count — drives salting/partition-balance tests."""
    n = rng.randint(2000, 8000)
    return [
        _span("text", _sentence(rng, 10), offset=i)
        for i in range(n)
    ]


def _gen_hostile(rng: random.Random, i: int) -> list[dict] | None:
    variants = [
        None,  # null spans
        [],  # empty spans
        [_span("mystery_kind", "???", offset=0)],  # unknown-only → error
        [_span("text", None, offset=0), _span("text", "ok text", offset=1)],  # null text
        [_span("text", "dup a", offset=5), _span("text", "dup b", offset=5)],  # dup offsets
        [_span("text", "", offset=0)],  # all-empty blocks → heading-only output
        [_span("image", "", f"img_{i}.jpg", offset=0)],  # media-only doc
        [_span("mystery_kind", "x", offset=0), _span("text", "mixed", offset=1)],
    ]
    return variants[i % len(variants)]


# --- corpus assembly -----------------------------------------------------------

SLICES = (
    ("plain_text", 0.22),
    ("gbk_bytes", 0.08),
    ("markdown", 0.14),
    ("paged", 0.22),
    ("sheet", 0.12),
    ("html", 0.14),
    ("hostile", 0.06),
    ("skewed", 0.02),
)


def iter_documents(n_docs: int = 400, seed: int = 42, skew: bool = True):
    """Deterministic per-doc generator — the streaming form of
    `generate_documents` (identical sequence for identical args)."""
    global _POOL
    rng = random.Random(seed)
    _POOL = _SentencePool(rng)
    for i in range(n_docs):
        doc_id = f"doc-{i:06d}"
        r = rng.random()
        acc = 0.0
        slice_name = SLICES[-1][0]
        for name, w in SLICES:
            acc += w
            if r < acc:
                slice_name = name
                break
        if slice_name == "skewed" and not skew:
            slice_name = "plain_text"
        if slice_name == "plain_text":
            spans = _gen_plain_text(rng)
        elif slice_name == "gbk_bytes":
            spans = _gen_gbk_bytes(rng)
        elif slice_name == "markdown":
            spans = _gen_markdown(rng)
        elif slice_name == "paged":
            spans = _gen_paged(rng, doc_id)
        elif slice_name == "sheet":
            spans = _gen_sheet(rng)
        elif slice_name == "html":
            spans = _gen_html(rng, doc_id)
        elif slice_name == "hostile":
            spans = _gen_hostile(rng, i)
        else:
            spans = _gen_skewed(rng, doc_id)
        yield (doc_id, spans)


def generate_documents(n_docs: int = 400, seed: int = 42,
                       skew: bool = True) -> list[tuple[str, list[dict] | None]]:
    """Deterministic corpus: list of (doc_id, spans)."""
    return list(iter_documents(n_docs, seed, skew))


def to_arrow(docs: list[tuple[str, list[dict] | None]]) -> pa.Table:
    return pa.table(
        {
            "doc_id": [d for d, _ in docs],
            "spans": pa.array([s for _, s in docs], type=pa.list_(_SPAN_FIELDS)),
        },
        schema=DOCS_ARROW_SCHEMA,
    )


def write_corpus(path: str, n_docs: int = 400, seed: int = 42,
                 skew: bool = True, row_group_size: int = 512,
                 chunk_docs: int = 50_000) -> pa.Table | None:
    """Write the corpus parquet. Small corpora return the table; large ones
    stream through a ParquetWriter in `chunk_docs` slices (a 1M-doc corpus
    measured 35+ GB RSS when built as one Python list). Both paths produce
    byte-identical content for the same (n_docs, seed, skew)."""
    if n_docs <= chunk_docs:
        table = to_arrow(generate_documents(n_docs, seed, skew))
        pq.write_table(table, path, row_group_size=row_group_size)
        return table
    writer = pq.ParquetWriter(path, DOCS_ARROW_SCHEMA)
    buf: list[tuple[str, list[dict] | None]] = []
    try:
        for doc in iter_documents(n_docs, seed, skew):
            buf.append(doc)
            if len(buf) >= chunk_docs:
                writer.write_table(to_arrow(buf), row_group_size=row_group_size)
                buf = []
        if buf:
            writer.write_table(to_arrow(buf), row_group_size=row_group_size)
    finally:
        writer.close()
    return None


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "documents_spans.parquet"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    write_corpus(out, n_docs=n)
    print(f"wrote {n} docs to {out}")

"""The extraction operator — ONE Arrow-batched `mapInArrow` stage.

Implements docs/SPANS.md over record batches: content-sniffing dispatch,
per-format assembly (text wrap / markdown passthrough / encoding fallback /
page assembly / sheet tables / HTML boilerplate strip), image keep-or-strip,
and per-document failure containment. Replaces the reference's per-file Python
loop (/root/reference/ocr_toolkit/cli/convert.py:536-540) and its processor
dispatch (:380-445) with masked vectorized work over the whole batch:

- explode `spans` via Arrow list offsets (zero-copy, no Python dicts for the
  relational shape),
- one stable (doc, offset) sort for reading order — `order` derives from data,
  never from batch position (SPANS.md §5),
- pandas `.str` / NumPy masks for all text transforms,
- per-doc Python only for the two genuinely sequential kernels (HTML block
  parse, sheet table stringify), amortized across the batch.

A document that fails (bad encoding, hostile content) yields an error row —
never a task failure (reference: ocr_processor_wrapper.py:135-149).
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame

from ..functions.cells import format_cells
from ..functions.html import extract_blocks
from ..functions.textops import transform_text
from ..schema import EXTRACTED_SCHEMA

KNOWN_KINDS = frozenset(
    {"text", "heading", "html", "image", "table_row", "page_break", "bytes"}
)
_MD_HEADER = r"^#{1,6} "

_OUT_SPAN_TYPE = pa.struct(
    [
        pa.field("kind", pa.string(), nullable=False),
        pa.field("text", pa.string(), nullable=False),
        pa.field("media_ref", pa.string(), nullable=False),
        pa.field("order", pa.int32(), nullable=False),
    ]
)

_EM_COLS = ["di", "sortkey", "kind", "text", "media_ref"]


def _empty_emissions() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "di": pd.Series(dtype=np.int64),
            "sortkey": pd.Series(dtype=np.float64),
            "kind": pd.Series(dtype=object),
            "text": pd.Series(dtype=object),
            "media_ref": pd.Series(dtype=object),
        }
    )


def _decode_hex_bytes(values: pd.Series) -> tuple[pd.Series, pd.Series]:
    """UTF-8 strict → GBK strict fallback (text_file_processor.py:70-78).
    Returns (decoded, failed_mask). Loop only over the bytes-span minority —
    the reference semantics are inherently per-value here."""
    decoded = []
    failed = []
    for v in values:
        try:
            raw = bytes.fromhex(str(v).strip())
        except ValueError:
            decoded.append("")
            failed.append(True)
            continue
        try:
            decoded.append(raw.decode("utf-8"))
            failed.append(False)
        except UnicodeDecodeError:
            try:
                decoded.append(raw.decode("gbk"))
                failed.append(False)
            except UnicodeDecodeError:
                decoded.append("")
                failed.append(True)
    return (
        pd.Series(decoded, index=values.index, dtype=object),
        pd.Series(failed, index=values.index, dtype=bool),
    )


def _process_batch(batch: pa.RecordBatch, with_images: bool) -> pa.RecordBatch:
    t0 = time.perf_counter()
    n_docs = batch.num_rows
    doc_ids = batch.column("doc_id").to_pandas().astype(str).to_numpy(dtype=object)
    spans_col = batch.column("spans")

    lengths = (
        pa.compute.list_value_length(spans_col).to_pandas().fillna(0).to_numpy(np.int64)
    )
    no_spans = lengths == 0  # null or empty → error (SPANS.md §3.8)

    flat = spans_col.flatten()  # struct values of all valid list slots, in doc order
    di = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)

    sp = pd.DataFrame(
        {
            "di": di,
            "kind": flat.field("kind").to_pandas().fillna("").to_numpy(dtype=object),
            "text": flat.field("text").to_pandas().fillna("").to_numpy(dtype=object),
            "media_ref": flat.field("media_ref")
            .to_pandas()
            .fillna("")
            .to_numpy(dtype=object),
            "offset": flat.field("offset").to_pandas().fillna(0).to_numpy(np.int64),
        }
    )
    # reading order: ascending offset, ties keep array position (SPANS.md §0)
    sp = sp.sort_values(["di", "offset"], kind="stable", ignore_index=True)
    sp["seq"] = np.arange(len(sp), dtype=np.int64)

    # ---- dispatch (SPANS.md §1), fully vectorized --------------------------
    k = sp["kind"]
    flag = pd.DataFrame(
        {
            "html": k.eq("html"),
            "sheet": k.eq("table_row"),
            "paged": k.eq("page_break"),
            "bytes": k.eq("bytes"),
            "texty": k.isin(("text", "heading")),
            "known": k.isin(KNOWN_KINDS),
        }
    )
    flag["di"] = sp["di"]
    agg = flag.groupby("di").any().reindex(np.arange(n_docs), fill_value=False)

    texty_nonempty = flag["texty"].to_numpy() & (
        sp["text"].str.strip().ne("").to_numpy()
    )
    first_texty = sp[texty_nonempty].groupby("di")["text"].first()
    md_docs = first_texty.str.strip().str.match(_MD_HEADER)
    is_md = md_docs.reindex(np.arange(n_docs), fill_value=False).to_numpy(bool)

    fmt = np.select(
        [
            no_spans,
            agg["html"].to_numpy(),
            agg["sheet"].to_numpy(),
            agg["paged"].to_numpy(),
            agg["bytes"].to_numpy(),
            agg["texty"].to_numpy() & is_md,
            agg["texty"].to_numpy(),
            agg["known"].to_numpy(),
        ],
        ["error", "html", "sheet", "paged", "bytes_text", "markdown", "text", "text"],
        default="error",
    )

    errors = np.full(n_docs, "", dtype=object)
    errors[no_spans] = "empty document: no spans"
    unk = (fmt == "error") & ~no_spans
    errors[unk] = "unsupported content: no known span kinds"

    sp["fmt"] = fmt[sp["di"].to_numpy()]

    # ---- per-span text transform (image keep/strip, SPANS.md §3.6) ---------
    sp["text_t"] = transform_text(sp["text"], with_images)

    emissions: list[pd.DataFrame] = []

    # ---- bytes decode (SPANS.md §3.3) ---------------------------------------
    bytes_mask = (sp["fmt"] == "bytes_text") & sp["kind"].eq("bytes")
    if bytes_mask.any():
        decoded, failed = _decode_hex_bytes(sp.loc[bytes_mask, "text"])
        sp.loc[bytes_mask, "text_t"] = transform_text(decoded, with_images)
        failed_di = np.unique(sp.loc[bytes_mask, "di"].to_numpy()[failed.to_numpy()])
        errors[failed_di] = "decode error: not utf-8 or gbk"
        # decoded bytes spans participate like text spans below
        sp.loc[bytes_mask, "kind"] = "text"

    # ---- text / bytes_text wrap (SPANS.md §3.1/3.3) -------------------------
    text_fmt = np.isin(fmt, ("text", "bytes_text"))
    tdocs = np.nonzero(text_fmt)[0]
    if len(tdocs):
        emissions.append(
            pd.DataFrame(
                {
                    "di": tdocs,
                    "sortkey": -1.0,
                    "kind": "heading",
                    "text": np.char.add("# ", doc_ids[tdocs].astype(str)).astype(object),
                    "media_ref": "",
                }
            )
        )
        body = sp[
            sp["fmt"].isin(("text", "bytes_text"))
            & sp["kind"].isin(("text", "heading"))
        ].copy()
        body["text"] = body["text_t"].str.strip()
        body = body[body["text"].ne("")]
        emissions.append(
            pd.DataFrame(
                {
                    "di": body["di"].to_numpy(),
                    "sortkey": body["seq"].to_numpy(np.float64),
                    "kind": "text",
                    "text": body["text"].to_numpy(dtype=object),
                    "media_ref": "",
                }
            )
        )

    # ---- markdown passthrough (SPANS.md §3.2) -------------------------------
    md = sp[(sp["fmt"] == "markdown") & sp["kind"].isin(("text", "heading"))].copy()
    if len(md):
        md["text"] = md["text_t"].str.strip()
        md = md[md["text"].ne("")]
        md_kind = np.where(md["text"].str.match(_MD_HEADER), "heading", "text")
        emissions.append(
            pd.DataFrame(
                {
                    "di": md["di"].to_numpy(),
                    "sortkey": md["seq"].to_numpy(np.float64),
                    "kind": md_kind.astype(object),
                    "text": md["text"].to_numpy(dtype=object),
                    "media_ref": "",
                }
            )
        )

    # ---- paged assembly (SPANS.md §3.4) -------------------------------------
    pg = sp[sp["fmt"] == "paged"].copy()
    if len(pg):
        pg["page"] = pg["kind"].eq("page_break").groupby(pg["di"]).cumsum() + 1
        parts = []
        h = pg[pg["kind"] == "heading"].copy()
        h["otext"] = h["text"].str.strip()  # headings untransformed (SPANS.md §3.4)
        h = h[h["otext"].ne("")]
        h["okind"] = "heading"
        parts.append(h)
        tx = pg[pg["kind"] == "text"].copy()
        tx["otext"] = tx["text_t"].str.strip()
        tx = tx[tx["otext"].ne("")]
        tx["okind"] = "text"
        parts.append(tx)
        if with_images:
            im = pg[pg["kind"] == "image"].copy()
            im["otext"] = ""
            im["okind"] = "image"
            parts.append(im)
        body = pd.concat(parts).sort_values("seq", kind="stable")
        if len(body):
            hdr = (
                body.groupby(["di", "page"], sort=False)["seq"].min().reset_index()
            )
            emissions.append(
                pd.DataFrame(
                    {
                        "di": hdr["di"].to_numpy(),
                        "sortkey": hdr["seq"].to_numpy(np.float64) - 0.5,
                        "kind": "heading",
                        "text": ("## Page " + hdr["page"].astype(str)).to_numpy(
                            dtype=object
                        ),
                        "media_ref": "",
                    }
                )
            )
            emissions.append(
                pd.DataFrame(
                    {
                        "di": body["di"].to_numpy(),
                        "sortkey": body["seq"].to_numpy(np.float64),
                        "kind": body["okind"].to_numpy(dtype=object),
                        "text": body["otext"].to_numpy(dtype=object),
                        "media_ref": np.where(
                            body["okind"].eq("image"), body["media_ref"], ""
                        ).astype(object),
                    }
                )
            )

    # ---- sheet assembly (SPANS.md §3.5) -------------------------------------
    sh = sp[sp["fmt"] == "sheet"].copy()
    if len(sh):
        sdocs = np.unique(sh["di"].to_numpy())
        emissions.append(
            pd.DataFrame(
                {
                    "di": sdocs,
                    "sortkey": -1.0,
                    "kind": "heading",
                    "text": np.char.add("# ", doc_ids[sdocs].astype(str)).astype(object),
                    "media_ref": "",
                }
            )
        )
        sh = sh[sh["kind"].isin(("heading", "table_row"))].copy()
        sh["sheet"] = sh["kind"].eq("heading").groupby(sh["di"]).cumsum()
        # sheet 0 exists only if it has table rows (rows before any heading)
        keep0 = sh["sheet"].gt(0) | sh["kind"].eq("table_row")
        sh = sh[keep0]
        if len(sh):
            rows = sh[sh["kind"] == "table_row"].copy()
            cell_lists = rows["text"].str.split("\x1f")
            exploded = cell_lists.explode()
            formatted = format_cells(exploded.astype(object))
            fmt_lists = formatted.groupby(level=0, sort=False).agg(list)
            rows["cells"] = fmt_lists
            rows["ncells"] = cell_lists.str.len()

            heads = sh[sh["kind"] == "heading"]
            sheet_names: dict[tuple[int, int], str] = {}
            sheet_key_seq: dict[tuple[int, int], int] = {}
            for di_, sheet_, seq_, txt_ in zip(
                heads["di"], heads["sheet"], heads["seq"], heads["text"]
            ):
                key = (int(di_), int(sheet_))
                sheet_names[key] = txt_.strip() or "Sheet"
                sheet_key_seq[key] = int(seq_)
            # sheets present (with or without rows)
            all_keys = sh.groupby(["di", "sheet"], sort=False)["seq"].min()
            em_di, em_sort, em_kind, em_text = [], [], [], []
            grouped_rows = {
                key: grp
                for key, grp in rows.groupby(["di", "sheet"], sort=False)
            }
            for (di_, sheet_), s0 in all_keys.items():
                key = (int(di_), int(sheet_))
                name = sheet_names.get(key, "Sheet1")
                em_di.append(di_)
                em_sort.append(float(s0))
                em_kind.append("heading")
                em_text.append(f"## Sheet: {name}")
                grp = grouped_rows.get(key)
                if grp is None or not len(grp):
                    em_di.append(di_)
                    em_sort.append(float(s0) + 0.5)
                    em_kind.append("text")
                    em_text.append("*(Empty sheet)*")
                    continue
                max_cols = int(grp["ncells"].max())
                lines: list[str] = []
                for i, cells in enumerate(grp["cells"]):
                    padded = cells + [""] * (max_cols - len(cells))
                    lines.append("| " + " | ".join(padded) + " |")
                    if i == 0:
                        lines.append("| " + " | ".join(["---"] * max_cols) + " |")
                em_di.append(di_)
                em_sort.append(float(s0) + 0.5)
                em_kind.append("table")
                em_text.append("\n".join(lines))
            emissions.append(
                pd.DataFrame(
                    {
                        "di": np.asarray(em_di, dtype=np.int64),
                        "sortkey": np.asarray(em_sort, dtype=np.float64),
                        "kind": np.asarray(em_kind, dtype=object),
                        "text": np.asarray(em_text, dtype=object),
                        "media_ref": "",
                    }
                )
            )

    # ---- html boilerplate strip (SPANS.md §3.7) ------------------------------
    ht = sp[(sp["fmt"] == "html") & sp["kind"].eq("html")]
    if len(ht):
        joined = ht.groupby("di", sort=False)["text"].agg("\n".join)
        em_di, em_sort, em_kind, em_text, em_ref = [], [], [], [], []
        for di_, html in joined.items():
            ctr = 0
            for blk in extract_blocks(html):
                if not blk.kept:
                    continue
                if blk.heading_level > 0:
                    em_kind.append("heading")
                    em_text.append("#" * blk.heading_level + " " + blk.text)
                    em_ref.append("")
                    em_di.append(di_)
                    em_sort.append(float(ctr))
                    ctr += 1
                else:
                    em_kind.append("text")
                    em_text.append(blk.text)
                    em_ref.append("")
                    em_di.append(di_)
                    em_sort.append(float(ctr))
                    ctr += 1
                if with_images:
                    for src in blk.img_srcs:
                        em_kind.append("image")
                        em_text.append("")
                        em_ref.append(src)
                        em_di.append(di_)
                        em_sort.append(float(ctr))
                        ctr += 1
        if em_di:
            emissions.append(
                pd.DataFrame(
                    {
                        "di": np.asarray(em_di, dtype=np.int64),
                        "sortkey": np.asarray(em_sort, dtype=np.float64),
                        "kind": np.asarray(em_kind, dtype=object),
                        "text": np.asarray(em_text, dtype=object),
                        "media_ref": np.asarray(em_ref, dtype=object),
                    }
                )
            )

    # ---- finalize -----------------------------------------------------------
    em = (
        pd.concat([e[_EM_COLS] for e in emissions], ignore_index=True)
        if emissions
        else _empty_emissions()
    )
    failed = errors != ""
    if failed.any() and len(em):
        em = em[~failed[em["di"].to_numpy()]]
    em = em.sort_values(["di", "sortkey"], kind="stable", ignore_index=True)

    em_di_arr = em["di"].to_numpy(np.int64) if len(em) else np.empty(0, np.int64)
    counts = np.bincount(em_di_arr, minlength=n_docs).astype(np.int64)
    order = np.arange(len(em), dtype=np.int32) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)))[:-1], counts
    ).astype(np.int32)

    out_values = pa.StructArray.from_arrays(
        [
            pa.array(em["kind"].to_numpy(dtype=object) if len(em) else [], pa.string()),
            pa.array(em["text"].to_numpy(dtype=object) if len(em) else [], pa.string()),
            pa.array(
                em["media_ref"].to_numpy(dtype=object) if len(em) else [], pa.string()
            ),
            pa.array(order, pa.int32()),
        ],
        fields=list(_OUT_SPAN_TYPE),
    )
    offsets = pa.array(
        np.concatenate(([0], np.cumsum(counts))).astype(np.int32), pa.int32()
    )
    out_spans = pa.ListArray.from_arrays(offsets, out_values)

    n_chars = np.zeros(n_docs, dtype=np.int64)
    if len(em):
        lens = em["text"].str.len().to_numpy(np.int64)
        np.add.at(n_chars, em_di_arr, lens)

    elapsed = (time.perf_counter() - t0) * 1000.0 / max(n_docs, 1)
    return pa.RecordBatch.from_arrays(
        [
            pa.array(doc_ids, pa.string()),
            out_spans,
            pa.array(~failed),
            pa.array(errors, pa.string()),
            pa.array(fmt, pa.string()),
            pa.array(counts.astype(np.int32), pa.int32()),
            pa.array(n_chars, pa.int64()),
            pa.array(np.full(n_docs, elapsed), pa.float64()),
        ],
        names=[f.name for f in EXTRACTED_SCHEMA.fields],
    )


def make_extract_fn(
    with_images: bool = True,
) -> Callable[[Iterator[pa.RecordBatch]], Iterator[pa.RecordBatch]]:
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows:
                yield _process_batch(batch, with_images)

    return fn


def extract_spans(df: DataFrame, with_images: bool = True) -> DataFrame:
    """documents(doc_id, spans) → extracted(...) via one mapInArrow stage."""
    return df.select("doc_id", "spans").mapInArrow(
        make_extract_fn(with_images), EXTRACTED_SCHEMA
    )

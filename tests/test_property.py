"""Property-based tests (hypothesis): the vectorized kernels must equal the
oracle on ARBITRARY inputs, not just the fixture distributions — randomized
span soup, adversarial cell payloads, arbitrary page selections."""

import string

import pytest
from hypothesis import given, settings, strategies as st

from ocr_toolkit_spark import oracle
from ocr_toolkit_spark.fixtures import to_arrow
from ocr_toolkit_spark.functions.cells import format_cells
from ocr_toolkit_spark.operators.extract import _process_batch

TEXT = st.text(
    # '?' '=' '&' ';' fuzz processing-instruction / DOCTYPE / entity shapes
    # through the html kernel (the r1 unnamed-tag divergence class)
    alphabet=string.ascii_letters + string.digits
    + " \n\t#|-*.!()[]<>/\"'?=&;中文字" + "\x1f",
    max_size=120,
)
KINDS = st.sampled_from(
    ["text", "heading", "html", "image", "table_row", "page_break", "bytes",
     "mystery", ""]
)

HEXISH = st.one_of(
    st.sampled_from([
        "68656c6c6f",                      # valid utf-8 'hello'
        "d6d0cec4".upper(),                # gbk '中文' (upper-hex)
        "fffe8140ffff",                    # undecodable either way
        " 414243 ",                        # whitespace-padded hex
        "zznothex",
        "",
    ]),
    st.binary(max_size=12).map(lambda b: b.hex()),
)

SPAN = st.fixed_dictionaries(
    {
        "kind": KINDS,
        "text": st.one_of(st.none(), TEXT, HEXISH),
        "media_ref": st.one_of(st.none(), st.text(max_size=20)),
        "offset": st.one_of(st.none(), st.integers(-5, 50)),
    }
)
DOC = st.one_of(st.none(), st.lists(SPAN, max_size=12))


def _tuples(result_spans):
    return [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in result_spans]


@settings(max_examples=60, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=8), st.booleans())
def test_kernel_equals_oracle_on_arbitrary_spans(span_docs, with_images):
    docs = [(f"d{i}", s) for i, s in enumerate(span_docs)]
    # bytes spans carry hex; arbitrary text is usually invalid hex → the
    # decode-error containment path gets exercised constantly here
    batch = to_arrow(docs).combine_chunks().to_batches()[0]
    res = _process_batch(batch, with_images).to_pylist()
    assert len(res) == len(docs)
    for r in res:
        g = oracle.extract_document(r["doc_id"], dict(docs)[r["doc_id"]], with_images)
        assert _tuples(r["out_spans"]) == [
            (s.kind, s.text, s.media_ref, s.order) for s in g.out_spans
        ], r["doc_id"]
        assert r["success"] == g.success and r["error"] == g.error
        assert r["method"] == g.method


def test_inf_cell_contained_per_doc():
    """End-to-end: a sheet doc holding a '1e999' cell becomes an error row
    with the oracle's exact message; sibling docs in the SAME batch are
    unaffected (ADVICE r1 high: this used to kill the whole task)."""
    sheet = lambda cell: [
        {"kind": "heading", "text": "S1", "media_ref": "", "offset": 0},
        {"kind": "table_row", "text": f"{cell}\x1fok", "media_ref": "", "offset": 1},
    ]
    docs = [("bad", sheet("1e999")), ("good", sheet("1.5")),
            ("bad2", sheet("-1e999"))]
    batch = to_arrow(docs).combine_chunks().to_batches()[0]
    res = {r["doc_id"]: r for r in _process_batch(batch, True).to_pylist()}
    for did, spans in docs:
        g = oracle.extract_document(did, spans, True)
        r = res[did]
        assert r["success"] == g.success and r["error"] == g.error, did
        assert _tuples(r["out_spans"]) == [
            (s.kind, s.text, s.media_ref, s.order) for s in g.out_spans
        ], did
    assert not res["bad"]["success"] and res["good"]["success"]
    assert "OverflowError" in res["bad"]["error"]


CELL = st.one_of(
    st.text(max_size=130),
    st.integers(-10**12, 10**12).map(str),
    st.floats(allow_nan=False, allow_infinity=False, width=32).map(repr),
    st.sampled_from(["", "nan", "inf", "-inf", "1e3", "0.0", "-0.0",
                     "2024-01-02T03:04:05", "2024-13-99T99:99:99", "1.", ".5",
                     "a|b|c", "x" * 101, "+7", "-0", "  3  "]),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(CELL, min_size=1, max_size=30))
def test_cell_formatting_matches_oracle(cells):
    import pandas as pd

    got, nonfinite = format_cells(pd.Series(cells, dtype=object))
    for i, c in enumerate(cells):
        if nonfinite[i]:
            # kernel flags exactly the cells where the oracle raises
            with pytest.raises(OverflowError):
                oracle.format_cell(c)
        else:
            assert got.iloc[i] == oracle.format_cell(c)


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.sampled_from(["1e999", "-1e999", "1e400", "9" * 400 + ".0",
                     "1.5", "7", "plain"]),
    min_size=1, max_size=20,
))
def test_nonfinite_cells_flagged_not_raised(cells):
    """ADVICE r1 (high): '1e999' floats to inf; str(int(inf)) used to raise
    OverflowError inside the vectorized kernel and kill the whole task.
    Now the kernel flags the cell and the caller emits a per-doc error row."""
    import pandas as pd

    got, nonfinite = format_cells(pd.Series(cells, dtype=object))
    for i, c in enumerate(cells):
        try:
            oracle.format_cell(c)
            oracle_raises = False
        except OverflowError:
            oracle_raises = True
        assert nonfinite[i] == oracle_raises


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.fixed_dictionaries({"kind": st.just("page_break"),
                                   "text": st.just(""),
                                   "media_ref": st.just(""),
                                   "offset": st.integers(0, 30)}),
            st.fixed_dictionaries({"kind": st.sampled_from(["text", "heading", "image"]),
                                   "text": TEXT,
                                   "media_ref": st.text(max_size=8),
                                   "offset": st.integers(0, 30)}),
        ),
        min_size=1, max_size=15,
    ),
    st.sets(st.integers(1, 6), min_size=1, max_size=3),
)
def test_page_selection_matches_oracle(spans, pages):
    sel = frozenset(pages)
    g = oracle.extract_document("d", spans, pages=sel)
    batch = to_arrow([("d", spans)]).combine_chunks().to_batches()[0]
    k = _process_batch(batch, True, sel).to_pylist()[0]
    assert _tuples(k["out_spans"]) == [
        (s.kind, s.text, s.media_ref, s.order) for s in g.out_spans
    ]
    assert k["success"] == g.success and k["error"] == g.error

"""Checked-in golden regression (FIXTURES.md §2): the engine AND the oracle
must both match the frozen `tests/golden/*.parquet` artifacts for the
canonical seed-42 corpus. This catches the failure mode the live
oracle-vs-kernel comparison cannot: both implementations drifting together
after a (possibly unintended) semantics change. Regenerate the artifacts ONLY
for a deliberate spec change, in the same commit that updates docs/SPANS.md.
"""

import os

import pyarrow.parquet as pq

from ocr_toolkit_spark import oracle
from ocr_toolkit_spark.fixtures import generate_documents, to_arrow
from ocr_toolkit_spark.operators.extract import _process_batch

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _load_golden():
    spans = pq.read_table(
        os.path.join(GOLDEN_DIR, "expected_spans_seed42.parquet")
    ).to_pylist()
    meta = pq.read_table(
        os.path.join(GOLDEN_DIR, "expected_meta_seed42.parquet")
    ).to_pylist()
    by_doc: dict[str, list] = {m["doc_id"]: [] for m in meta}
    for s in spans:
        by_doc[s["doc_id"]].append((s["kind"], s["text"], s["media_ref"], s["order"]))
    for v in by_doc.values():
        v.sort(key=lambda t: t[3])
    return by_doc, {m["doc_id"]: m for m in meta}


def test_engine_matches_checked_in_golden():
    docs = generate_documents(300, 42)
    golden_spans, golden_meta = _load_golden()
    batch = to_arrow(docs).combine_chunks().to_batches()[0]
    out = _process_batch(batch, True).to_pylist()
    assert len(out) == len(golden_meta)
    for r in out:
        g = golden_meta[r["doc_id"]]
        eng = [(s["kind"], s["text"], s["media_ref"], s["order"])
               for s in r["out_spans"]]
        assert eng == golden_spans[r["doc_id"]], r["doc_id"]
        assert r["success"] == g["success"] and r["error"] == g["error"]
        assert r["method"] == g["method"] and r["n_chars"] == g["n_chars"]


def test_engine_matches_strip_mode_golden():
    docs = generate_documents(300, 42)
    spans = pq.read_table(
        os.path.join(GOLDEN_DIR, "expected_spans_seed42_noimages.parquet")
    ).to_pylist()
    golden: dict[str, list] = {}
    for s in spans:
        golden.setdefault(s["doc_id"], []).append(
            (s["kind"], s["text"], s["media_ref"], s["order"]))
    batch = to_arrow(docs).combine_chunks().to_batches()[0]
    for r in _process_batch(batch, False).to_pylist():
        eng = [(s["kind"], s["text"], s["media_ref"], s["order"])
               for s in r["out_spans"]]
        assert eng == sorted(golden.get(r["doc_id"], []), key=lambda t: t[3]), (
            r["doc_id"])


def test_oracle_matches_checked_in_golden():
    docs = generate_documents(300, 42)
    golden_spans, golden_meta = _load_golden()
    for res in oracle.extract_corpus(docs, True):
        g = golden_meta[res.doc_id]
        got = [(s.kind, s.text, s.media_ref, s.order) for s in res.out_spans]
        assert got == golden_spans[res.doc_id], res.doc_id
        assert res.success == g["success"] and res.method == g["method"]

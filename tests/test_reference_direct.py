"""DIRECT parity against the reference's own Python code (not just our
oracle's re-encoding of its rules): load the reference functions from
/root/reference at test time and fuzz ours against them.

The reference package does not import wholesale in this sandbox (its
processors.base chain needs modules absent from the public snapshot), so
each test loads exactly the unit it checks: page_selection.py imports
standalone; the Excel cell formatter is extracted by AST from
excel_processor.py and exec'd with only `datetime` injected.
"""

from __future__ import annotations

import ast
import datetime
import hashlib
import importlib.util
import random
from pathlib import Path

import pytest

from ocr_toolkit_spark import oracle
from ocr_toolkit_spark.functions.pages import parse_pages

REF = Path("/root/reference/ocr_toolkit")

# The reference tree is UNTRUSTED public content; these tests execute small
# units of it for parity evidence. Pin the exact bytes that are allowed to
# run (ADVICE r2): any change to the files aborts the test instead of
# executing unreviewed code.
_PINNED_SHA256 = {
    "utils/page_selection.py":
        "ec87d9e7974facd5dd89a28c93f618b7590d8ed0baa0623d6a1ac26d7999e78b",
    "processors/excel_processor.py":
        "a59aebd42f76bc574ddac923712d5a7842bac86bef2471e89b4a8b351dbc8cfd",
    "config.py":
        "4733f54e41f0f95d1e7f61a7057d5b91c138c5c8cef59af05cb05759338123ce",
    "quality_evaluator.py":
        "7f8fc1e31358c5b66fcae3dfde6e9d9819db09ddcf12223cceca144fe440d802",
    "processors/stats.py":
        "b98451e8de85bf0b14c9db93f24bf94879ee72c354f48f800a1c0fdb591522fd",
}


def _pinned(rel: str) -> Path:
    """Return the reference path after verifying its content hash."""
    path = REF / rel
    digest = hashlib.sha256(path.read_bytes()).hexdigest()
    assert digest == _PINNED_SHA256[rel], (
        f"reference file {rel} changed (sha256 {digest}); refusing to exec"
    )
    return path


def _load_page_selection():
    import sys

    spec = importlib.util.spec_from_file_location(
        "ref_page_selection", _pinned("utils/page_selection.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod  # dataclass processing needs registration
    spec.loader.exec_module(mod)
    return mod


def _load_format_cell_value():
    text = _pinned("processors/excel_processor.py").read_text()
    tree = ast.parse(text)
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "_format_cell_value":
            src = ast.get_source_segment(text, node)
            ns = {"datetime": datetime.datetime}
            exec("def _f(self, cell_value):" + src.split(":", 1)[1], ns)
            return lambda v: ns["_f"](None, v)
    raise AssertionError("_format_cell_value not found in reference")


class TestParsePagesDirect:
    def test_matches_reference_on_fuzzed_specs(self):
        ref = _load_page_selection()
        rng = random.Random(11)
        specs = [None, "", "  ", ",", "1", "1-5", "5-1", "1-5,10,20-25",
                 "1 - 3", "2-2", "0", "-1", "a", "1-b", "1-", "-"]
        for _ in range(300):
            parts = []
            for _ in range(rng.randrange(1, 4)):
                a = rng.randrange(-2, 30)
                parts.append(f"{a}-{rng.randrange(-2, 30)}"
                             if rng.random() < 0.5 else str(a))
            specs.append(",".join(parts))
        for spec in specs:
            try:
                expected = ref.parse_pages_arg(spec)
                ref_err = None
            except (ValueError, TypeError) as e:
                ref_err = type(e)
            try:
                got = parse_pages(spec)
                our_err = None
            except ValueError:
                our_err = ValueError
            if ref_err is not None:
                assert our_err is not None, spec
                continue
            assert our_err is None, spec
            if expected is None:
                assert got is None, spec
            else:
                # reference returns 0-based indices; engine 1-based pages
                assert got == frozenset(i + 1 for i in expected.indices), spec


def _load_quality_evaluator():
    """Package shim: quality_evaluator does `from . import config`, and the
    snapshot's full package does not import — load just the pair."""
    import sys
    import types

    if "refpkg.quality_evaluator" not in sys.modules:
        pkg = types.ModuleType("refpkg")
        pkg.__path__ = [str(REF)]
        sys.modules["refpkg"] = pkg
        for name, path in [("refpkg.config", _pinned("config.py")),
                           ("refpkg.quality_evaluator",
                            _pinned("quality_evaluator.py"))]:
            spec = importlib.util.spec_from_file_location(name, path)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
    return sys.modules["refpkg.quality_evaluator"].QualityEvaluator()


class TestQualityDirect:
    KEYS = ("length_score", "structure_score", "diversity_score",
            "error_penalty", "total_score")

    def _texts(self):
        import string

        rng = random.Random(424243)
        # \r \x85  : Java multiline ^ anchors after these unless
        # UNIX_LINES — locks the (?dm) fix (ADVICE r2 medium)
        alpha = (string.ascii_letters + string.digits
                 + " \n\t#-*.•!@$%^&*(){}[]\"'中文字?!;:,\x1c\x1f\xa0　"
                 + "\r\x85\u2028 ")
        texts = ["".join(rng.choice(alpha)
                         for _ in range(rng.randrange(0, 250)))
                 for _ in range(400)]
        texts += ["1. numbered\n2. list", "#x", "# x", "", "   ", "a" * 5,
                  "中 a 中", "\nlead", "trail\t", "many words " * 80]
        return texts

    def test_oracle_matches_reference(self):
        """oracle.quality_score IS the reference formula: fuzz both over
        hostile text, every component equal at 1e-9."""
        qe = _load_quality_evaluator()
        for t in self._texts():
            exp = qe.calculate_text_quality_score(t)
            got = oracle.quality_score(t)
            for k in self.KEYS:
                assert abs(got[k] - exp[k]) < 1e-9, (k, t[:60])

    def test_spark_matches_reference(self, spark):
        """...and so do the Spark column expressions, end to end."""
        from ocr_toolkit_spark.operators.textstats import with_quality

        qe = _load_quality_evaluator()
        texts = self._texts()
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id int, text string")
        for r in with_quality(df, "text").collect():
            exp = qe.calculate_text_quality_score(texts[r["id"]])
            for k in self.KEYS:
                assert abs(getattr(r, k) - exp[k]) < 1e-9, (k, r["id"])

    def test_compare_methods_matches_reference(self, spark):
        """T11 against the reference's compare_results: same (md, ocr,
        file_path) inputs → same chosen_method, availability and scores
        (ours fixed-point-rounds to 4 decimals; compared at 1e-4)."""
        from pyspark.sql import functions as F

        from ocr_toolkit_spark.operators.textstats import compare_methods

        qe = _load_quality_evaluator()
        rng = random.Random(99)
        good = ("# Title\n\nA normal paragraph with plenty of words here.\n\n"
                "- one\n- two\n\nMore prose of a reasonable length follows.")
        cases = []
        for i in range(60):
            md_ok = rng.random() > 0.3
            ocr_ok = rng.random() > 0.3
            md_tx = rng.choice([good, good[:50], "", "short", good * 2])
            ocr_tx = rng.choice([good, good[:70], "", "tiny", good[:120]])
            ext = rng.choice([".pdf", ".docx", ".jpg", ".html", ".txt", ".TIF"])
            cases.append((i, md_ok, md_tx, ocr_ok, ocr_tx, ext))
        df = spark.createDataFrame(
            cases, "id int, md_ok boolean, md_tx string, ocr_ok boolean, "
                   "ocr_tx string, ext string")
        cols = compare_methods(F.col("md_ok"), F.col("md_tx"),
                               F.col("ocr_ok"), F.col("ocr_tx"), F.col("ext"))
        got = {r["id"]: r for r in df.select(
            "id", *[c.alias(n) for n, c in cols.items()]).collect()}
        for i, md_ok, md_tx, ocr_ok, ocr_tx, ext in cases:
            exp = qe.compare_results(
                {"success": md_ok, "content": md_tx},
                {"success": ocr_ok, "content": ocr_tx},
                f"/docs/file{i}{ext}")
            r = got[i]
            assert r["chosen_method"] == exp["chosen_method"], i
            assert r["markitdown_available"] == bool(exp["markitdown_available"]), i
            assert r["ocr_available"] == bool(exp["ocr_available"]), i
            assert abs(r["markitdown_score"] - exp["markitdown_score"]) < 1e-4, i
            assert abs(r["ocr_score"] - exp["ocr_score"]) < 1e-4, i
            if not (exp["markitdown_available"] and exp["ocr_available"]):
                assert r["selection_reason"] == exp["selection_reason"], i


def _load_processing_stats():
    import sys

    spec = importlib.util.spec_from_file_location(
        "ref_stats", _pinned("processors/stats.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


class TestRunReportDirect:
    def test_matches_reference_processing_stats(self, spark):
        """A1/A2: feed identical per-doc results to the reference's
        ProcessingStats accumulator and to pipeline.run_report; every shared
        metric must agree (reference reports success_rate in percent, the
        engine as a fraction — documented scale difference)."""
        from ocr_toolkit_spark.pipeline import run_report

        ref = _load_processing_stats()
        st = ref.ProcessingStats()
        rng = random.Random(5)
        rows = []
        for i in range(400):
            method = rng.choice(["text", "html", "sheet", "paged", "error"])
            success = method != "error" and rng.random() > 0.1
            elapsed = round(rng.uniform(0.2, 9.0), 3)
            spans = rng.randrange(0, 30) if success else 0
            st.add_result(method, success, elapsed / 1000.0, pages=spans)
            rows.append((f"d{i}", success, "" if success else "boom",
                         method, spans, spans * 10, elapsed))
        df = spark.createDataFrame(
            rows, "doc_id string, success boolean, error string, "
                  "method string, n_spans int, n_chars long, elapsed_ms double")
        rep = run_report(df)
        summary = st.get_summary()
        assert rep["docs"] == summary["total_processed"]
        assert rep["succeeded"] == summary["successful_processed"]
        assert rep["failed"] == summary["failed_processed"]
        assert abs(rep["success_rate"] * 100 - summary["success_rate"]) < 1e-9
        assert abs(rep["avg_elapsed_ms"] / 1000.0
                   - summary["average_time_per_file"]) < 1e-9
        assert {m: v["docs"] for m, v in rep["by_method"].items()} == \
            summary["method_stats"]
        assert rep["spans"] == summary["total_pages"]


class TestCellFormatDirect:
    def test_matches_reference_on_typed_values(self):
        """oracle.format_cell over our string-encoded cells must equal the
        reference formatter over the original TYPED values for every type
        it handles (None / datetime / int / float / str)."""
        ref_fmt = _load_format_cell_value()
        rng = random.Random(7)
        # NOTE: strings that LOOK numeric ("3.0") are excluded — the span
        # model is stringly typed, so the encoding cannot distinguish the
        # string "3.0" from the float 3.0 (documented, SPANS.md §3.5
        # type-by-sniffing); every representable typed value must agree.
        typed = [None, 0, 42, -7, 10**19, 3.0, -0.0, 3.14159, 2.5, 1e18,
                 123456.789, datetime.datetime(2024, 1, 2, 3, 4, 5),
                 "plain", "a|b", "x" * 150, "", "  spaced  ", "nan"]
        typed += [rng.randrange(-10**9, 10**9) for _ in range(100)]
        typed += [round(rng.uniform(-1e6, 1e6), rng.randrange(0, 8))
                  for _ in range(150)]
        for v in typed:
            # our span encoding of a typed cell (fixtures discipline):
            # datetime → ISO-T, None → '', numbers → repr, str as-is
            if v is None:
                enc = ""
            elif isinstance(v, datetime.datetime):
                enc = v.strftime("%Y-%m-%dT%H:%M:%S")
            else:
                enc = str(v)
            assert oracle.format_cell(enc) == ref_fmt(v), (v, enc)

    def test_reference_float_repr_edge(self):
        """str(float) encodings that stop looking like float literals
        (scientific repr) fall to the string rule — documented encoding
        boundary, asserted so a repr change would surface."""
        ref_fmt = _load_format_cell_value()
        v = 1e25  # str() -> '1e+25'; reference formats the FLOAT: int str
        assert ref_fmt(v) == str(int(v))
        # our encoding str(1e25)='1e+25' has a '+' exponent — matches the
        # float regex and reproduces the same rendering
        assert oracle.format_cell(str(v)) == str(int(v))

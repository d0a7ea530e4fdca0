"""Unit tests of the oracle against hand-computed expectations from the
reference's rules (cited per test). Table-driven, mirroring the reference's
own unit style (/root/reference/tests/unit/test_excel_processor.py:112-160)."""

from ocr_toolkit_spark import oracle


def _spans(*triples):
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(triples)
    ]


class TestDispatch:
    def test_priority_order(self):
        # html beats table_row beats page_break beats bytes (SPANS.md §1)
        assert oracle.sniff_format(_spans(("html", "<p>x</p>", ""), ("table_row", "a", ""))) == "html"
        assert oracle.sniff_format(_spans(("table_row", "a", ""), ("page_break", "", ""))) == "sheet"
        assert oracle.sniff_format(_spans(("page_break", "", ""), ("bytes", "00", ""))) == "paged"
        assert oracle.sniff_format(_spans(("bytes", "41", ""), ("text", "x", ""))) == "bytes_text"

    def test_markdown_sniff(self):
        assert oracle.sniff_format(_spans(("text", "# Title", ""))) == "markdown"
        assert oracle.sniff_format(_spans(("text", "  ## T", ""))) == "markdown"  # stripped
        assert oracle.sniff_format(_spans(("text", "#nospace", ""))) == "text"
        assert oracle.sniff_format(_spans(("text", "", ""), ("text", "# T", ""))) == "markdown"

    def test_error_routes(self):
        assert oracle.sniff_format(None) == "error"
        assert oracle.sniff_format([]) == "error"
        assert oracle.sniff_format(_spans(("mystery", "x", ""))) == "error"
        # media-only doc routes to text (heading-only output)
        assert oracle.sniff_format(_spans(("image", "", "i.jpg"))) == "text"


class TestTextRules:
    def test_wrap_rule(self):
        # `# {filename}\n\n{content}` wrap (text_file_processor.py:104-122)
        r = oracle.extract_document("d1", _spans(("text", " hello ", "")))
        assert [(s.kind, s.text) for s in r.out_spans] == [
            ("heading", "# d1"), ("text", "hello")]

    def test_markdown_verbatim(self):
        r = oracle.extract_document("d1", _spans(("text", "# T", ""), ("text", "body", "")))
        assert r.method == "markdown"
        assert [(s.kind, s.text) for s in r.out_spans] == [
            ("heading", "# T"), ("text", "body")]

    def test_gbk_fallback(self):
        gbk = "中文".encode("gbk").hex()
        r = oracle.extract_document("d1", _spans(("bytes", gbk, "")))
        assert r.success and r.out_spans[1].text == "中文"

    def test_bad_bytes_error(self):
        r = oracle.extract_document("d1", _spans(("bytes", "fffe8140ffff", "")))
        assert not r.success and r.error == "decode error: not utf-8 or gbk"
        assert r.out_spans == []


class TestPaged:
    def test_page_headers_and_empty_pages(self):
        # `## Page {n}` (openocr_doc_handler.py:219); empty pages skipped
        spans = [
            {"kind": "text", "text": "p1", "media_ref": "", "offset": 0},
            {"kind": "page_break", "text": "", "media_ref": "", "offset": 1},
            {"kind": "page_break", "text": "", "media_ref": "", "offset": 2},  # empty page 2
            {"kind": "text", "text": "p3", "media_ref": "", "offset": 3},
        ]
        r = oracle.extract_document("d", spans)
        assert [(s.kind, s.text) for s in r.out_spans] == [
            ("heading", "## Page 1"), ("text", "p1"),
            ("heading", "## Page 3"), ("text", "p3")]

    def test_reading_order_from_offsets(self):
        spans = [
            {"kind": "text", "text": "second", "media_ref": "", "offset": 20},
            {"kind": "page_break", "text": "", "media_ref": "", "offset": 5},
            {"kind": "text", "text": "first", "media_ref": "", "offset": 10},
        ]
        r = oracle.extract_document("d", spans)
        assert [s.text for s in r.out_spans] == ["## Page 2", "first", "second"]

    def test_image_keep_vs_strip(self):
        spans = [
            {"kind": "image", "text": "", "media_ref": "i.jpg", "offset": 0},
            {"kind": "text", "text": 'x <img src="imgs/a.png"> y', "media_ref": "", "offset": 1},
            {"kind": "page_break", "text": "", "media_ref": "", "offset": 2},
            {"kind": "text", "text": "z", "media_ref": "", "offset": 3},
        ]
        keep = oracle.extract_document("d", spans, with_images=True)
        assert ("image", "", "i.jpg", 1) in [
            (s.kind, s.text, s.media_ref, s.order) for s in keep.out_spans]
        assert 'src="media/a.png"' in keep.out_spans[2].text  # prefix rewrite
        strip = oracle.extract_document("d", spans, with_images=False)
        kinds = [s.kind for s in strip.out_spans]
        assert "image" not in kinds
        assert strip.out_spans[1].text == "x  y"  # <img> removed (:334-336)


class TestCellsAndSheets:
    def test_cell_formats(self):
        # exact reference rules (excel_processor.py:206-242)
        assert oracle.format_cell("") == ""
        assert oracle.format_cell("2024-01-02T03:04:05") == "2024-01-02 03:04:05"
        assert oracle.format_cell("42") == "42"
        assert oracle.format_cell("-7") == "-7"
        assert oracle.format_cell("3.0") == "3"
        assert oracle.format_cell("3.14159") == "3.14"
        assert oracle.format_cell("a|b") == "a\\|b"
        assert oracle.format_cell("x" * 150) == "x" * 97 + "..."
        assert oracle.format_cell("nan") == "nan"  # not a float literal

    def test_sheet_table(self):
        spans = [
            {"kind": "heading", "text": "S1", "media_ref": "", "offset": 0},
            {"kind": "table_row", "text": "a\x1fb", "media_ref": "", "offset": 1},
            {"kind": "table_row", "text": "1\x1f2\x1f3", "media_ref": "", "offset": 2},
        ]
        r = oracle.extract_document("d", spans)
        table = [s for s in r.out_spans if s.kind == "table"][0]
        assert table.text.split("\n") == [
            "| a | b |  |",
            "| --- | --- | --- |",
            "| 1 | 2 | 3 |",
        ]

    def test_empty_sheet_marker(self):
        spans = [{"kind": "heading", "text": "Empty", "media_ref": "", "offset": 0},
                 {"kind": "table_row", "text": "x", "media_ref": "", "offset": 1},
                 {"kind": "heading", "text": "E2", "media_ref": "", "offset": 2}]
        r = oracle.extract_document("d", spans)
        texts = [s.text for s in r.out_spans]
        assert "*(Empty sheet)*" in texts  # excel_processor.py:174


class TestHtml:
    def test_boilerplate_dropped(self):
        html = ('<html><body><nav><a href="/">home</a></nav>'
                "<h1>Title</h1><p>" + "main content word " * 5 + "</p>"
                '<footer><p>copyright</p></footer></body></html>')
        r = oracle.extract_document("d", [{"kind": "html", "text": html,
                                           "media_ref": "", "offset": 0}])
        kinds_texts = [(s.kind, s.text) for s in r.out_spans]
        assert kinds_texts[0] == ("heading", "# Title")
        assert any(k == "text" and "main content" in t for k, t in kinds_texts)
        assert not any("home" in t or "copyright" in t for _, t in kinds_texts)

    def test_link_farm_dropped(self):
        html = ('<p><a href="/1">aaaaaaaaaaaa</a> <a href="/2">bbbbbbbbbbbb</a> '
                '<a href="/3">cccccccccccc</a></p>')
        r = oracle.extract_document("d", [{"kind": "html", "text": html,
                                           "media_ref": "", "offset": 0}])
        assert r.out_spans == []

    def test_unnamed_tags_not_counted_as_tags(self):
        """ADVICE r1 (medium): <?pi?> / <!DOCTYPE> / <123> are not tags —
        neither oracle nor kernel may count them toward tag density.
        10 PIs around a short-word block used to flip the kernel's keep
        decision while the oracle kept it."""
        from ocr_toolkit_spark.functions.html import extract_blocks

        pis = "<?php noise ?>" * 10
        html = f"<p>{pis}ten tiny words here to go over the length bar{pis}</p>"
        r = oracle.extract_document("d", [{"kind": "html", "text": html,
                                           "media_ref": "", "offset": 0}])
        assert [s.text for s in r.out_spans] == [
            "ten tiny words here to go over the length bar"]
        kept = [b.text for b in extract_blocks(html) if b.kept]
        assert kept == ["ten tiny words here to go over the length bar"]

    def test_control_char_whitespace_before_tag_name(self):
        """Python's \\s (oracle regex) treats U+001C-001F and Unicode spaces
        as whitespace before a tag name — '<\\x1fp>' IS a <p> block tag, and
        an unnamed '<\\x1f@>' is not a tag at all. Found by fuzzing; the
        kernel's manual scan used an ASCII-only set."""
        from ocr_toolkit_spark.functions.html import extract_blocks

        body = "twenty five characters of body text here"
        for html in (f"<\x1fp>{body}<\x1fq>{body}</p>",
                     f"<\xa0p>{body}</\x1cp>{body}",
                     f"W!&wP<\x1fhtLY\n=x>{body}"):
            r = oracle.extract_document(
                "d", [{"kind": "html", "text": html, "media_ref": "",
                       "offset": 0}])
            kept = [(b.text, b.kept) for b in extract_blocks(html)]
            assert [t for t, k in kept if k] == [s.text for s in r.out_spans], html

    def test_script_and_entities(self):
        html = ("<p>safe &amp; sound, longer than the minimum length</p>"
                "<script>ignored = '<p>junk</p>';</script>")
        r = oracle.extract_document("d", [{"kind": "html", "text": html,
                                           "media_ref": "", "offset": 0}])
        assert [s.text for s in r.out_spans] == [
            "safe & sound, longer than the minimum length"]


class TestQuality:
    def test_empty(self):
        q = oracle.quality_score("")
        assert q["total_score"] == 0 and q["error_penalty"] == 1.0

    def test_formula(self):
        # quality_evaluator.py:46-126: known small input
        t = "# H\n\npara one line\n\n- item"
        q = oracle.quality_score(t)
        assert q["length_score"] == len(t.strip()) / 1000 * 10
        assert q["structure_score"] == 5 + 2 + 3 + 1.5  # 1 hdr,1 list,3 paras,3 lines
        assert q["error_penalty"] == 1.0

    def test_repetition_penalty(self):
        q = oracle.quality_score("normal text here aaaaa more")
        assert q["error_penalty"] == 0.8

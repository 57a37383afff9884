"""HTML→text extraction (functions/html.py): pinned semantics for
the WET step — tag stripping, script/style removal, entity decoding,
whitespace normalization — plus the Spark-side Arrow kernel posture.
"""

from __future__ import annotations

import pytest

from garmin_data_pipeline_spark.functions.html import (
    extract_html_text,
    html_to_text,
)

X = extract_html_text


class TestExtractSemantics:
    def test_basic_document(self):
        html = (
            "<html><head><title>T</title></head>"
            "<body><h1>Head</h1><p>para one</p></body></html>"
        )
        assert X(html) == "T Head para one"

    def test_script_and_style_content_dropped(self):
        html = (
            "<script>if (1 < 2) { alert('<p>fake</p>'); }</script>"
            "<style>p { color: red; }</style>keep"
        )
        # the '<' inside script cannot fake a tag: raw-text mode
        assert X(html) == "keep"

    def test_unclosed_script_drops_rest(self):
        assert X("before<script>var x = 1;") == "before"

    def test_template_content_dropped(self):
        assert X("<template><p>ghost</p></template>real") == "real"

    def test_tags_are_whitespace_separators(self):
        assert X("a<b>b</b>c") == "a b c"
        assert X("a<br/>b") == "a b"

    def test_nested_and_unclosed_tags(self):
        assert X("<div><p>one <b>two") == "one two"
        assert X("</div></div>stray closers") == "stray closers"

    def test_attribute_containing_gt(self):
        assert X('<p data-x="a>b">body</p>') == "body"

    def test_comments_and_doctype_vanish(self):
        assert X("<!DOCTYPE html><!-- a <p> comment -->x") == "x"

    def test_cdata_content_kept(self):
        assert X("<p>a</p><![CDATA[raw <not-a-tag>]]>b") == (
            "a raw <not-a-tag> b"
        )

    def test_entities_named_decimal_hex(self):
        assert X("&lt;tag&gt; &#72;&#105; &#x4F;") == "<tag> Hi O"

    def test_no_double_decode(self):
        # &amp;lt; is the literal text '&lt;', never '<'
        assert X("&amp;lt;") == "&lt;"
        assert X("&amp;amp;") == "&amp;"

    def test_bogus_entities_stay_literal(self):
        assert X("bad &#xZZ; and &unknownent; stay") == (
            "bad &#xZZ; and &unknownent; stay"
        )

    def test_nbsp_and_literal_nbsp_become_space(self):
        assert X("a&nbsp;b") == "a b"
        assert X("a\xa0b") == "a b"

    def test_ascii_whitespace_collapses(self):
        assert X("a \t\r\n\f  b") == "a b"

    def test_exotic_unicode_whitespace_passes_through(self):
        # U+2028 is NOT in RE2's \s — it must survive byte-for-byte
        # (that is what keeps the oracle cross-engine exact)
        assert X("a\u2028b") == "a\u2028b"
        # and VT (0x0B): Python's \s includes it, RE2's does not —
        # the kernel class is pinned to RE2's
        assert X("a\x0bb") == "a\x0bb"

    def test_multibyte_text_untouched(self):
        s = "中文 🚀 café ﬁ"
        assert X(f"<p>{s}</p>") == s

    def test_empty_and_markup_free(self):
        assert X("") == ""
        assert X("   \n ") == ""
        assert X("no markup") == "no markup"

    def test_uppercase_tags(self):
        assert X("<SCRIPT>x</SCRIPT><P>ok</P>") == "ok"


class TestSparkKernel:
    def test_null_in_null_out_and_arrow_eval(self, spark):
        df = spark.createDataFrame(
            [(1, "<p>a</p>"), (2, None), (3, "<b>c&amp;d</b>")],
            "id int, html string",
        )
        out = df.select("id", html_to_text("html").alias("t"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        # Arrow-batched scalar pandas_udf — never row-at-a-time
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan
        got = {r["id"]: r["t"] for r in out.collect()}
        assert got == {1: "a", 2: None, 3: "c&d"}


class TestReviewRegressions:
    def test_stray_closer_inside_template_does_not_leak(self):
        """r12 review: a stray </script> inside <template> must not
        end the template's skip — skip state is a matching stack."""
        assert X("<template>hidden</script>leaked</template>ok") == "ok"
        assert X("<template>a<script>b</script>c</template>ok") == "ok"
        assert X("</template>stray closer ok") == "stray closer ok"

"""HTML→text extraction (functions/html.py): pinned semantics for
the WET step — tag stripping, script/style removal, entity decoding,
whitespace normalization — plus the Spark-side Arrow kernel posture,
and the BLOCK segmentation the main-content filter (s18) builds on.
"""

from __future__ import annotations

import pytest

from garmin_data_pipeline_spark.functions.html import (
    extract_html_blocks,
    extract_html_text,
    html_blocks_rows,
    html_to_text,
)

X = extract_html_text
B = extract_html_blocks


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


class TestBlockSegmentation:
    """The s18 kernel's pinned semantics: blocks delimit at
    block-level tags, label = innermost open block tag, anchor_chars
    = normalized <a> data without separators, empty runs emit
    nothing."""

    def test_basic_blocks_in_document_order(self):
        html = (
            "<html><body><nav><a href='/'>Home</a>"
            "<a href='/a'>About</a></nav><h1>Title</h1>"
            "<p>main text here</p></body></html>"
        )
        assert B(html) == [
            ("nav", "Home About", 9),
            ("h1", "Title", 0),
            ("p", "main text here", 0),
        ]

    def test_anchor_chars_concatenate_without_separators(self):
        # 'HomeAbout' = 9, not 10: the pinned jusText numerator rule
        blocks = B("<div><a>Home</a><a>About</a></div>")
        assert blocks == [("div", "Home About", 9)]

    def test_inline_markup_stays_in_block(self):
        assert B("<p>a <b>bold</b> tail</p>") == [
            ("p", "a bold tail", 0)
        ]

    def test_empty_blocks_emit_nothing(self):
        assert B("<div>  </div><p></p><p>x</p>") == [("p", "x", 0)]

    def test_script_subtree_dropped(self):
        assert B("<p>keep<script>if (1 < 2) {}</script></p>") == [
            ("p", "keep", 0)
        ]

    def test_nested_blocks_attribute_to_innermost(self):
        blocks = B("<div>outer one<p>inner</p>outer two</div>")
        assert blocks == [
            ("div", "outer one", 0),
            ("p", "inner", 0),
            ("div", "outer two", 0),
        ]

    def test_text_outside_any_block(self):
        assert B("free floating") == [("", "free floating", 0)]

    def test_unclosed_blocks_flush_at_eof(self):
        assert B("<div><p>dangling") == [("p", "dangling", 0)]

    def test_anchor_across_nbsp_and_ws_normalized(self):
        blocks = B("<p><a>two\xa0 words</a></p>")
        assert blocks == [("p", "two words", 9)]

    def test_hr_delimits(self):
        assert B("<p>a<hr/>b</p>") == [("p", "a", 0), ("p", "b", 0)]

    def test_bare_hr_delimits_without_corrupting_labels(self):
        """r13 review: bare <hr> (the HTML5 spelling) is a VOID
        element — it must delimit but never become an open block, or
        every later block is mislabeled 'hr' and enclosing closers
        stop popping."""
        assert B("<div>intro<hr>main content</div><p>after</p>") == [
            ("div", "intro", 0),
            ("div", "main content", 0),
            ("p", "after", 0),
        ]

    def test_unclosed_anchor_does_not_poison_later_blocks(self):
        """r13 review: anchor accounting is block-local — one
        malformed unclosed <a> must not count every later block's
        text as anchor chars (which would classify the page's whole
        main content as boilerplate)."""
        blocks = B(
            '<div><a href="/m">read more</div>'
            "<p>This is the long main article text of the page</p>"
        )
        assert blocks == [
            ("div", "read more", 9),
            ("p", "This is the long main article text of the page", 0),
        ]

    def test_skipped_subtree_is_inert_for_anchors(self):
        """ADVICE r13: an unclosed <a> inside a skipped <template>
        must not leak anchor accounting into the enclosing block."""
        blocks = B(
            "<p><template><a></template>main long article text</p>"
        )
        assert blocks == [("p", "main long article text", 0)]

    def test_skipped_subtree_is_inert_for_blocks(self):
        """Block tags inside a skipped subtree neither flush nor
        open blocks (the old code flushed mid-block on a <div>
        inside <template>)."""
        assert B("<p>a<template><div>x</div></template>b</p>") == [
            ("p", "a b", 0)
        ]

    def test_skip_element_boundary_still_separates(self):
        # html_to_text parity: 'a<script>x</script>b' reads 'a b'
        assert B("<p>a<script>x</script>b</p>") == [("p", "a b", 0)]
        assert X("a<script>x</script>b") == "a b"

    def test_implied_end_tags_pop_through(self):
        """ADVICE r13: '</div>' with an open <p> closes the implied
        </p> too (browser behavior), so later runs aren't mislabeled
        'p'; a stray closer with no matching open block pops
        nothing."""
        assert B("<div><p>a</div>b") == [
            ("p", "a", 0),
            ("", "b", 0),
        ]
        assert B("</div><p>a</p>") == [("p", "a", 0)]
        # well-formed nesting unchanged
        assert B("<div><p>a</p>b</div>") == [
            ("p", "a", 0),
            ("div", "b", 0),
        ]

    def test_spark_rows_shape_and_error_posture(self, spark):
        df = spark.createDataFrame(
            [
                (1, "<nav><a>Home</a></nav><p>body text</p>"),
                (2, None),  # NULL page -> zero block rows
            ],
            "doc_id long, page string",
        )
        out = html_blocks_rows(df, "doc_id", "page")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan
        assert "BatchEvalPython" not in plan
        rows = sorted(
            (
                (r["doc_id"], r["block_idx"], r["tag"], r["text"],
                 r["anchor_chars"])
                for r in out.collect()
            )
        )
        assert rows == [
            (1, 0, "nav", "Home", 4),
            (1, 1, "p", "body text", 0),
        ]


class TestClassifyBlocks:
    """The context-SENSITIVE keep policy (VERDICT r13 directive 1):
    stopword density + the jusText neighbor rule, as pure relational
    expressions over the block rows."""

    def _classify(self, spark, rows):
        from garmin_data_pipeline_spark.functions.html import (
            classify_blocks,
        )

        df = spark.createDataFrame(
            rows,
            "doc_id long, block_idx int, tag string, text string,"
            " anchor_chars long",
        )
        return {
            (r["doc_id"], r["block_idx"]): (r["cls"], r["kept"])
            for r in classify_blocks(df, "doc_id").collect()
        }

    GOOD = "this is the main text of the page and it is long"
    BAD_CLOUD = (
        "spark hadoop flink kafka beam arrow parquet avro iceberg"
    )

    def test_heading_between_bad_and_good_is_kept(self, spark):
        """The r13 verdict's heading-retention case: a short <h1>
        whose NEXT decided neighbor is good main content must be
        KEPT (the old context-free policy dropped every heading)."""
        out = self._classify(
            spark,
            [
                (1, 0, "nav", "Home About", 9),
                (1, 1, "h1", "Page Title", 0),
                (1, 2, "p", self.GOOD, 0),
            ],
        )
        assert out[(1, 0)] == ("bad", 0)
        assert out[(1, 1)] == ("short", 1)  # KEPT via neighbor rule
        assert out[(1, 2)] == ("good", 1)

    def test_short_island_amid_boilerplate_dropped(self, spark):
        out = self._classify(
            spark,
            [
                (1, 0, "aside", "Ad one here Ad two there", 23),
                (1, 1, "div", "Cookie settings", 0),
                (1, 2, "footer", "Terms of Use Privacy", 18),
            ],
        )
        assert out[(1, 1)] == ("short", 0)

    def test_stopword_free_slab_is_bad(self, spark):
        """Long + link-light but stopword-free (tag cloud): the NEW
        discriminator — the r13 context-free policy kept it."""
        out = self._classify(spark, [(1, 0, "div", self.BAD_CLOUD, 0)])
        assert out[(1, 0)] == ("bad", 0)

    def test_short_after_good_kept_via_prev_neighbor(self, spark):
        out = self._classify(
            spark,
            [
                (1, 0, "p", self.GOOD, 0),
                (1, 1, "p", "A short coda.", 0),
            ],
        )
        assert out[(1, 1)] == ("short", 1)

    def test_all_short_page_keeps_nothing(self, spark):
        # no decided neighbor at all -> NULL windows -> coalesce(F)
        out = self._classify(
            spark,
            [(1, 0, "p", "one", 0), (1, 1, "p", "two", 0)],
        )
        assert out[(1, 0)] == ("short", 0)
        assert out[(1, 1)] == ("short", 0)

    def test_link_dense_short_is_bad_not_short(self, spark):
        # the link-density arm decides BEFORE the length arm
        out = self._classify(spark, [(1, 0, "nav", "Home About", 9)])
        assert out[(1, 0)] == ("bad", 0)

    def test_exchange_reused_by_downstream_groupby(self, spark):
        """classify_blocks' windows partition by doc_id — the same
        partitioning a per-doc reassembly needs, so the plan carries
        ONE doc_id Exchange, not two (the 100 TB shape claim)."""
        from pyspark.sql import functions as F

        from garmin_data_pipeline_spark.functions.html import (
            classify_blocks,
        )

        df = spark.createDataFrame(
            [(1, 0, "p", self.GOOD, 0)],
            "doc_id long, block_idx int, tag string, text string,"
            " anchor_chars long",
        )
        out = (
            classify_blocks(df, "doc_id")
            .filter(F.col("kept") == 1)
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning(doc_id") == 1, (
            plan
        )

"""LLM-data-pipeline driver-contract queries: text analysis, dedup,
similarity search, multimodal plumbing — over the ``documents`` and
``embeddings`` testdata tables.

Oracle SQL is *generated from the same constants* as the Spark plans
(stopword lists, hyperplane matrices, tokenization regex) so both
sides compute identical semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from garmin_data_pipeline_spark.functions import html as H
from garmin_data_pipeline_spark.operators import text as T
from garmin_data_pipeline_spark.operators.dedup_scale import (
    _minhash_params,
    exact_duplicates,
    exact_substring_spans,
    minhash_lsh_pairs,
    containment_pairs,
    ngram_jaccard_pairs,
    prefix_jaccard_pairs,
    simhash_candidate_pairs,
    sql_base_hash32,
    substring_excision_spans,
)
from garmin_data_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image_metadata,
)
from garmin_data_pipeline_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
    grid_centroids,
    hyperplanes,
    probe_masks,
)
from garmin_data_pipeline_spark.plans.registry import register, table

_TOKS = T.sql_tokens("text")


# ---------------------------------------------------------------------------
# Text analysis: token counting + quality scoring (north-star ops).
# ---------------------------------------------------------------------------
@register(
    "t1_token_quality",
    f"""
    WITH t AS (
        SELECT doc_id, text, {_TOKS} AS toks FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct_tokens,
           CASE WHEN len(toks) > 0 THEN
               CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT)
                   / len(toks) ELSE 0.0 END AS mean_word_len,
           CASE WHEN len(text) > 0 THEN
               len(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                   / len(text) ELSE 0.0 END AS alpha_ratio,
           CASE WHEN len(toks) > 0 THEN
               {T.sql_stopword_hits("toks", "en")} / len(toks)
               ELSE 0.0 END AS stopword_ratio,
           CASE WHEN len(toks) > 0 THEN
               len(list_distinct(toks)) / len(toks)
               ELSE 0.0 END AS distinct_ratio
    FROM t
    """,
    doc="Token counts + quality features per document (text analysis).",
)
def t1_token_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    out = T.quality_features(docs, "text")
    return out.select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        "mean_word_len",
        "alpha_ratio",
        "stopword_ratio",
        "distinct_ratio",
    )


def _sql_langid() -> str:
    """Oracle mirror of text.language_guess (same priority/tie rules,
    same zero-token guard: empty docs score 0.0, not NULL)."""
    score = {
        lang: (
            f"(CASE WHEN len(toks) > 0 THEN "
            f"{T.sql_stopword_hits('toks', lang)} / len(toks) "
            f"ELSE 0.0 END)"
        )
        for lang in T.LANG_PRIORITY
    }
    # same reverse CASE chain as language_guess
    expr = f"'{T.LANG_PRIORITY[-1]}'"
    for i in range(len(T.LANG_PRIORITY) - 2, -1, -1):
        lang = T.LANG_PRIORITY[i]
        conds = " AND ".join(
            f"{score[lang]} >= {score[o]}" for o in T.LANG_PRIORITY[i + 1 :]
        )
        expr = f"CASE WHEN {conds} THEN '{lang}' ELSE {expr} END"
    return expr


@register(
    "t2_language_id",
    f"""
    WITH t AS (
        SELECT doc_id, lang, {_TOKS} AS toks FROM documents
    )
    SELECT doc_id, lang AS declared_lang,
           {_sql_langid()} AS guessed_lang,
           CASE WHEN len(toks) > 0 THEN
               {T.sql_stopword_hits("toks", "en")} / len(toks)
               ELSE 0.0 END AS en_score
    FROM t
    """,
    doc="Stopword-ratio language-ID heuristic (text analysis).",
)
def t2_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    scores = T.language_scores(F.col("text"))
    return docs.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        T.language_guess(F.col("text")).alias("guessed_lang"),
        scores["en"].alias("en_score"),
    )


@register(
    "t3_fingerprint",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           md5(COALESCE(
               array_to_string(list_sort(list_distinct(toks)), ' '), ''
           )) AS fingerprint
    FROM t
    """,
    doc="Bag-of-tokens md5 document fingerprint (text analysis). "
    "NULL text == empty bag (md5('')), matching the Spark concat_ws "
    "null-skipping semantics.",
)
def t3_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.fingerprint(F.col("text")).alias("fingerprint")
    )


# ---------------------------------------------------------------------------
# Dedup family.
# ---------------------------------------------------------------------------
@register(
    "d1_exact_dedup",
    r"""
    SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
               AS text_hash,
           MIN(doc_id) AS canonical_id,
           COUNT(*) AS n_dups
    FROM documents
    GROUP BY 1
    """,
    doc="Exact dedup via normalized-text hash groupBy.",
)
def d1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_duplicates(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    )


# d2 config: 3-gram shingles (selective; the web-dedup standard and
# d3's exact config, so d2 is d3's exact verifier) + a document-
# frequency cap on shingles. The cap is the 100TB skew guard: a
# shingle present in k docs emits O(k^2) join rows, so stop-shingles
# must be dropped BEFORE the self-join. Doc sizes stay uncapped —
# jaccard is then a lower bound, and the output a subset, of the exact
# answer (the safe direction for a dedup filter).
_D2_MAX_DF = 50
_SH3 = T.sql_shingles(_TOKS, 3)


# Shared CTE chain: df-capped exact-Jaccard pairs (d2's oracle body,
# reused as the edge list of d5's recursive-components oracle).
_SQL_JACCARD_CTES = f"""
    sh AS (
        SELECT doc_id AS doc, UNNEST({_SH3}) AS shingle
        FROM documents
    ), sizes AS (
        SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc
    ), keep AS (
        SELECT shingle FROM sh
        GROUP BY shingle HAVING COUNT(*) <= {_D2_MAX_DF}
    ), shc AS (
        SELECT sh.doc, sh.shingle FROM sh JOIN keep USING (shingle)
    ), inter AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS inter
        FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc < b.doc
        GROUP BY a.doc, b.doc
    ), jpairs AS (
        SELECT doc_a, doc_b, inter,
               inter / (sa.sz + sb.sz - inter) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc = doc_a
        JOIN sizes sb ON sb.doc = doc_b
        WHERE inter / (sa.sz + sb.sz - inter) >= 0.5
    )"""


@register(
    "d2_token_jaccard_pairs",
    f"""
    WITH {_SQL_JACCARD_CTES}
    SELECT doc_a, doc_b, inter, jaccard FROM jpairs
    """,
    doc="Exact 3-gram Jaccard >= 0.5 pairs via df-capped inverted index.",
)
def d2_token_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=3,
        threshold=0.5,
        max_df=_D2_MAX_DF,
    )


# d8: the LOSSLESS exact-Jaccard join — prefix filtering (SSJoin /
# PPJoin) instead of d2's max_df cap. The oracle is the UNCAPPED
# textbook inverted-index self-join (no `keep` CTE): every pair with
# set-Jaccard >= 0.8, which d2's capped output only under-approximates
# at its threshold. The Spark plan indexes only each document's
# |s| - ceil(t|s|) + 1 RAREST shingles (global df order) plus a
# length filter, then verifies candidates exactly — the df-ordered
# prefix keeps stop-shingles out of the self-join at any corpus size
# without losing pairs (operators/dedup_scale.py
# prefix_jaccard_pairs).
# Threshold 0.8 (the web-dedup standard), NOT d2's 0.5: the prefix
# bound's power scales with t — at 0.8 the index holds ~20% of each
# document and the candidate set stays within a small factor of the
# answer, measured on the 10x probe. At 0.5 the same (correct) plan
# indexes half of every document and the verification expansion
# (candidates x doc size) dominated: 310k candidates for ~300 true
# pairs at sf0.1, 4.3x wall at 10x data with every stage cardinality
# exactly linear — the filter, not the join, was the bottleneck.
@register(
    "d8_prefix_jaccard_pairs",
    f"""
    WITH sh AS (
        SELECT doc_id AS doc, UNNEST({_SH3}) AS shingle
        FROM documents
    ), sizes AS (
        SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc
    ), inter AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
        GROUP BY a.doc, b.doc
    )
    SELECT doc_a, doc_b, inter,
           inter / (sa.sz + sb.sz - inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc = doc_a
    JOIN sizes sb ON sb.doc = doc_b
    WHERE inter / (sa.sz + sb.sz - inter) >= 0.8
    """,
    doc="Exact (lossless) 3-gram set-Jaccard >= 0.8 pairs via prefix "
    "filtering: only each doc's rarest |s|-ceil(t|s|)+1 shingles are "
    "indexed (PPJoin bound — J >= t forces a prefix collision), "
    "length-filtered candidates verified against full shingle sets. "
    "Oracle is the uncapped quadratic inverted-index join.",
)
def d8_prefix_jaccard_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return prefix_jaccard_pairs(
        table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=3,
        threshold=0.8,
    )


# d9: containment (subset) pairs — the duplicate class Jaccard-family
# dedup structurally misses: a document quoted/truncated inside a
# 10x-longer one has Jaccard ~0.1 at containment 1.0. Candidates come
# from ONE probe shingle per document (its globally rarest — if
# B subset-of A then B's rarest shingle is in A, so the single-probe
# join is provably complete), verified exactly against the full sets.
# The oracle is the uncapped ordered-pair inverted join filtered to
# inter == |sub|.
@register(
    "d9_containment_pairs",
    f"""
    WITH sh AS (
        SELECT doc_id AS doc, UNNEST({_SH3}) AS shingle
        FROM documents
    ), sizes AS (
        SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc
    ), inter AS (
        SELECT a.doc AS doc_sub, b.doc AS doc_super, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc <> b.doc
        GROUP BY a.doc, b.doc
    )
    SELECT doc_sub, doc_super,
           sa.sz AS sz_sub, sb.sz AS sz_super
    FROM inter
    JOIN sizes sa ON sa.doc = doc_sub
    JOIN sizes sb ON sb.doc = doc_super
    WHERE inter = sa.sz AND sa.sz <= sb.sz
    """,
    doc="Exact shingle-set containment pairs (truncation/quote dups "
    "invisible to Jaccard): one rarest-shingle probe per document "
    "against the inverted index — provably complete for subsets — "
    "then exact verification. Oracle is the uncapped ordered-pair "
    "join filtered to inter == |sub|.",
)
def d9_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return containment_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text", n=3
    )


# d10: substring-level exact dedup — the ExactSubstr class (Lee et
# al. ACL 2022), the one duplication mode the whole document-level
# family (d1/d2/d8/d9/d3/d4) provably misses: a >= k-token span
# repeated verbatim inside otherwise-distinct documents. Linear by
# construction: windows aggregate by hash (a million-document
# boilerplate window is ONE count row, never pairs), hits semi-join
# back, adjacent positions merge to maximal spans with the w8 island
# pattern. tests/test_text_scale_ops.py plants a shared span inside
# two otherwise-distinct documents and proves d1/d8/d9 all miss it.
_D10_K = 8


@register(
    "d10_exact_substring_spans",
    f"""
    WITH t AS (SELECT doc_id AS doc, {_TOKS} AS toks FROM documents),
    w0 AS (
        SELECT doc,
               UNNEST(CASE WHEN len(toks) >= {_D10_K} THEN
                   generate_series(1, len(toks) - {_D10_K} + 1)
                   ELSE CAST([] AS BIGINT[]) END) AS pos,
               UNNEST({T.sql_positional_windows("toks", _D10_K)}) AS h
        FROM t
    ),
    dup AS (
        SELECT h FROM w0 GROUP BY h HAVING COUNT(DISTINCT doc) >= 2
    ),
    hits AS (SELECT doc, pos FROM w0 WHERE h IN (SELECT h FROM dup)),
    isl AS (
        SELECT doc, pos,
               pos - ROW_NUMBER() OVER (
                   PARTITION BY doc ORDER BY pos) AS grp
        FROM hits
    )
    SELECT doc AS doc_id,
           MIN(pos) AS span_start,
           MAX(pos) + {_D10_K} - 1 AS span_end,
           MAX(pos) + {_D10_K} - MIN(pos) AS span_len,
           COUNT(*) AS n_windows
    FROM isl GROUP BY doc, grp
    """,
    doc="Substring-level exact dedup (ExactSubstr, Lee et al. ACL "
    "2022): maximal token spans repeated verbatim across distinct "
    "documents, via md5'd positional 8-token windows -> "
    "count(distinct doc) per hash (never pair enumeration) -> "
    "semi-join back -> pos - row_number island merge. The span "
    "class invisible to every document-level dedup operator.",
)
def d10_exact_substring_spans(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return exact_substring_spans(
        table(spark, sf_dir, "documents"), "doc_id", "text", k=_D10_K
    )


# d10x: the dedup ACTION for the spans d10 reports — Lee et al.
# remove all-but-one occurrence of every duplicated span; this emits
# the per-doc spans to excise so each duplicated window keeps exactly
# one canonical occurrence (lexicographic min (doc, pos)) corpus-wide.
# Same linear aggregate shape; the canonical pick is a min(struct)
# inside the per-hash aggregate, never a pair join. The oracle ranks
# occurrences with a window (same result, oracle-side convenience).
@register(
    "d10x_substring_excision",
    f"""
    WITH t AS (SELECT doc_id AS doc, {_TOKS} AS toks FROM documents),
    w0 AS (
        SELECT doc,
               UNNEST(CASE WHEN len(toks) >= {_D10_K} THEN
                   generate_series(1, len(toks) - {_D10_K} + 1)
                   ELSE CAST([] AS BIGINT[]) END) AS pos,
               UNNEST({T.sql_positional_windows("toks", _D10_K)}) AS h
        FROM t
    ),
    dup AS (
        SELECT h FROM w0 GROUP BY h HAVING COUNT(DISTINCT doc) >= 2
    ),
    occ AS (
        SELECT doc, pos,
               ROW_NUMBER() OVER (
                   PARTITION BY h ORDER BY doc, pos) AS rk
        FROM w0 WHERE h IN (SELECT h FROM dup)
    ),
    hits AS (SELECT doc, pos FROM occ WHERE rk > 1),
    isl AS (
        SELECT doc, pos,
               pos - ROW_NUMBER() OVER (
                   PARTITION BY doc ORDER BY pos) AS grp
        FROM hits
    )
    SELECT doc AS doc_id,
           MIN(pos) AS span_start,
           MAX(pos) + {_D10_K} - 1 AS span_end,
           MAX(pos) + {_D10_K} - MIN(pos) AS span_len,
           COUNT(*) AS n_windows
    FROM isl GROUP BY doc, grp
    """,
    doc="Substring-dedup excision spans (the Lee et al. ACTION): "
    "every occurrence of a cross-doc-duplicated 8-token window "
    "except its canonical one (earliest position in the earliest "
    "document), merged to maximal per-doc spans. Canonical pick = "
    "min(struct(doc, pos)) inside the same single per-hash "
    "aggregate; excising the spans leaves exactly one verbatim "
    "copy of each duplicated run in the corpus.",
)
def d10x_substring_excision(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return substring_excision_spans(
        table(spark, sf_dir, "documents"), "doc_id", "text", k=_D10_K
    )


# c3: span-level decontamination — d10's window machinery applied
# train-vs-eval, completing the contamination family: c1 counts
# shingle overlap per doc, c2 purges whole docs, c3 reports the
# exact token spans where eval text leaks into training documents
# (the GPT-3/PaLM-appendix n-gram decontamination procedure). Same
# c1 split convention: eval = doc_id % 10 == 0.
@register(
    "c3_span_decontamination",
    f"""
    WITH tr AS (
        SELECT doc_id AS doc, {_TOKS} AS toks
        FROM documents WHERE doc_id % 10 != 0
    ),
    te AS (
        SELECT DISTINCT UNNEST(
            {T.sql_positional_windows(T.sql_tokens("text"), _D10_K)}
        ) AS h
        FROM documents WHERE doc_id % 10 = 0
    ),
    w0 AS (
        SELECT doc,
               UNNEST(CASE WHEN len(toks) >= {_D10_K} THEN
                   generate_series(1, len(toks) - {_D10_K} + 1)
                   ELSE CAST([] AS BIGINT[]) END) AS pos,
               UNNEST({T.sql_positional_windows("toks", _D10_K)}) AS h
        FROM tr
    ),
    hits AS (SELECT doc, pos FROM w0 WHERE h IN (SELECT h FROM te)),
    isl AS (
        SELECT doc, pos,
               pos - ROW_NUMBER() OVER (
                   PARTITION BY doc ORDER BY pos) AS grp
        FROM hits
    )
    SELECT doc AS doc_id,
           MIN(pos) AS span_start,
           MAX(pos) + {_D10_K} - 1 AS span_end,
           MAX(pos) + {_D10_K} - MIN(pos) AS span_len,
           COUNT(*) AS n_windows
    FROM isl GROUP BY doc, grp
    """,
    doc="Span-level decontamination: maximal train-doc token spans "
    "verbatim-matching any eval-corpus 8-token window. Eval side "
    "collapses to its distinct window-hash set (broadcastable at "
    "any train scale), train side is ONE pass: positional windows "
    "-> broadcast semi-join -> island merge. Reports WHERE the "
    "leak sits, not just that it exists (c1).",
)
def c3_span_decontamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from garmin_data_pipeline_spark.operators.contamination import (
        span_contamination,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return span_contamination(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
        "doc_id",
        "text",
        k=_D10_K,
    )


@register(
    "d5_duplicate_groups",
    f"""
    WITH RECURSIVE {_SQL_JACCARD_CTES},
    e AS (
        SELECT doc_a AS a, doc_b AS b FROM jpairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM jpairs
    ),
    reach(n, r) AS (
        SELECT a, a FROM e
        UNION
        SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.n
    ),
    comp AS (
        SELECT n AS doc_id, MIN(r) AS group_id FROM reach GROUP BY n
    )
    SELECT doc_id, group_id,
           COUNT(*) OVER (PARTITION BY group_id) AS group_size
    FROM comp
    """,
    doc="Duplicate-GROUP resolution: connected components of the d2 "
    "pair graph via iterative min-label propagation with a "
    "pointer-jumping shortcut (Pregel-style DataFrame loop, "
    "localCheckpoint per round, convergence by changed-label count "
    "folded into the round's single job; oracle = recursive "
    "transitive closure). Each cluster is labeled by its smallest "
    "member — the same canonical choice exact dedup makes. "
    "algorithm='star' swaps in large-star/small-star edge rewriting "
    "for adversarial graph shapes.",
)
def d5_duplicate_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.graph import (
        duplicate_groups,
    )

    pairs = ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=3,
        threshold=0.5,
        max_df=_D2_MAX_DF,
    )
    return duplicate_groups(pairs, "doc_a", "doc_b")


@register(
    "d5s_duplicate_groups_star",
    f"""
    WITH RECURSIVE {_SQL_JACCARD_CTES},
    e AS (
        SELECT doc_a AS a, doc_b AS b FROM jpairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM jpairs
    ),
    reach(n, r) AS (
        SELECT a, a FROM e
        UNION
        SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.n
    ),
    comp AS (
        SELECT n AS doc_id, MIN(r) AS group_id FROM reach GROUP BY n
    )
    SELECT doc_id, group_id,
           COUNT(*) OVER (PARTITION BY group_id) AS group_size
    FROM comp
    """,
    doc="d5's exact twin through the OTHER algorithm: duplicate "
    "groups via large-star/small-star edge rewriting (Kiveris et "
    "al. SoCC'14, O(log n) rounds on any graph shape) against the "
    "identical recursive-transitive-closure oracle — certifying that "
    "both connected-components implementations agree with the "
    "ground truth, not just with each other.",
)
def d5s_duplicate_groups_star(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from garmin_data_pipeline_spark.operators.graph import (
        duplicate_groups,
    )

    pairs = ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=3,
        threshold=0.5,
        max_df=_D2_MAX_DF,
    )
    return duplicate_groups(pairs, "doc_a", "doc_b", algorithm="star")


def _sql_minhash_lsh_ctes(num_hashes: int, bands: int) -> str:
    """The CTE chain of the minhash_lsh_pairs(hash_impl='md5') DuckDB
    mirror, ending at ``scored`` (doc_a, doc_b, est_jaccard) — shared
    by the d3p pair query and the d7p composed-pipeline oracle so the
    two can never drift. Same universal-hash params, same banding,
    same estimated-Jaccard score, generated from the SAME
    _minhash_params constants as the Spark plan."""
    rows = num_hashes // bands
    p = (1 << 61) - 1
    mins = ", ".join(
        f"MIN(({a} * h + {b}) % {p})"
        for a, b in _minhash_params(num_hashes)
    )
    return f"""sh AS (
        SELECT doc_id AS doc, UNNEST({_SH3}) AS shingle FROM documents
    ), h AS (
        SELECT doc, {sql_base_hash32("shingle")} AS h FROM sh
    ), sig AS (
        SELECT doc, [{mins}] AS sig FROM h GROUP BY doc
    ), banded AS (
        SELECT doc, band,
               array_to_string(
                   list_slice(sig, band * {rows} + 1,
                              band * {rows} + {rows}), ',') AS bucket
        FROM sig CROSS JOIN (
            SELECT UNNEST(range({bands})) AS band) bands
    ), pairs AS (
        SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
        FROM banded a JOIN banded b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
    ), scored AS (
        SELECT doc_a, doc_b,
               CAST(list_sum(list_transform(range(1, {num_hashes + 1}),
                   i -> CASE WHEN sa.sig[i] = sb.sig[i]
                        THEN 1 ELSE 0 END)) AS DOUBLE) / {num_hashes}
                   AS est_jaccard
        FROM pairs
        JOIN sig sa ON sa.doc = doc_a
        JOIN sig sb ON sb.doc = doc_b
    )"""


def _sql_minhash_lsh(
    num_hashes: int, bands: int, threshold: float
) -> str:
    """DuckDB mirror of minhash_lsh_pairs(hash_impl='md5'): the
    shared CTE chain plus the threshold filter — d3p is hash-matched
    end to end."""
    return f"""
    WITH {_sql_minhash_lsh_ctes(num_hashes, bands)}
    SELECT doc_a, doc_b, est_jaccard
    FROM scored WHERE est_jaccard >= {threshold}
    """


@register(
    "d3p_minhash_lsh_pairs",
    _sql_minhash_lsh(num_hashes=32, bands=8, threshold=0.5),
    doc="d3 under the md5-derived parity hash: same MinHash+LSH plan, "
    "hash-matched against a full DuckDB mirror (closes the d3 "
    "rows-only gap; production d3 keeps xxhash64).",
)
def d3p_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(
        table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        num_hashes=32,
        bands=8,
        shingle_n=3,
        threshold=0.5,
        hash_impl="md5",
    )


@register(
    "d3_minhash_lsh_pairs",
    None,  # xxhash64-based; not reproducible in DuckDB -> rows-only check
    doc="MinHash+LSH banded near-dup candidates (scale path for d2).",
)
def d3_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 3-gram shingles: the realistic web-dedup config, and the one that
    # keeps LSH buckets selective (unigram shingles over a small shared
    # vocabulary collapse every doc into the same buckets -> all-pairs).
    return minhash_lsh_pairs(
        table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        num_hashes=32,
        bands=8,
        shingle_n=3,
        threshold=0.5,
    ).orderBy("doc_a", "doc_b")


@register(
    "d4_simhash_candidates",
    None,  # xxhash64-based; rows-only
    doc="SimHash 16-bit-chunk near-dup candidates with Hamming distance.",
)
def d4_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        simhash_candidate_pairs(
            table(spark, sf_dir, "documents"), "doc_id", "text", chunks=4
        )
        .filter(F.col("hamming") <= 16)
        .orderBy("doc_a", "doc_b")
    )


def _sql_simhash_candidates(chunks: int, max_hamming: int) -> str:
    """DuckDB mirror of simhash_candidate_pairs(hash_impl='md5'):
    32-bit signature (md5-derived token hashes), per-bit majority vote,
    chunked pigeonhole candidates, exact Hamming distance."""
    bits = 32
    width = bits // chunks
    mask = (1 << width) - 1
    bit_sums = ", ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )
    pack = " + ".join(
        f"CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END"
        for i in range(bits)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id AS doc, UNNEST({_TOKS}) AS token FROM documents
    ), h AS (
        SELECT doc, {sql_base_hash32("token")} AS h FROM tok
    ), bits AS (
        SELECT doc, {bit_sums} FROM h GROUP BY doc
    ), sig AS (
        SELECT doc, ({pack}) AS simhash FROM bits
    ), chunked AS (
        SELECT doc, simhash, chunk,
               (simhash >> (chunk * {width})) & {mask} AS val
        FROM sig CROSS JOIN (
            SELECT UNNEST(range({chunks})) AS chunk) chunks
    ), pairs AS (
        SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
               a.simhash AS sh_a, b.simhash AS sh_b
        FROM chunked a JOIN chunked b
            ON a.chunk = b.chunk AND a.val = b.val AND a.doc < b.doc
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
    FROM pairs
    WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
    """


@register(
    "d4p_simhash_candidates",
    _sql_simhash_candidates(chunks=4, max_hamming=8),
    doc="d4 under the md5-derived parity hash: 32-bit SimHash, 8-bit "
    "chunks, hash-matched DuckDB mirror (production d4 keeps the "
    "64-bit xxhash64 signature).",
)
def d4p_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        simhash_candidate_pairs(
            table(spark, sf_dir, "documents"),
            "doc_id",
            "text",
            chunks=4,
            hash_impl="md5",
        )
        .filter(F.col("hamming") <= 8)
        .select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))
    )


# ---------------------------------------------------------------------------
# Similarity search over embeddings.
# ---------------------------------------------------------------------------
# NULL-safe cosine mirror of similarity.cosine: NULLIF guards the
# zero-norm divide (Spark side uses try_divide — ANSI mode would
# otherwise throw DIVIDE_BY_ZERO on one corrupt vector).
_COS = (
    "list_dot_product(v, qv) / "
    "NULLIF(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv)),"
    " 0)"
)


@register(
    "v1_cosine_topk_bruteforce",
    f"""
    WITH q AS (
        SELECT vec_id AS query_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id < 5
    ), c AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), scored AS (
        SELECT query_id, vec_id, {_COS} AS cos_raw
        FROM c CROSS JOIN q
        WHERE {_COS} IS NOT NULL
    )
    SELECT query_id, vec_id, ROUND(cos_raw, 6) AS cosine,
           CAST(rnk AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos_raw DESC, vec_id
        ) AS rnk FROM scored
    ) WHERE rnk <= 10
    """,
    doc="Brute-force cosine top-10 per query vector (exact ANN "
    "baseline). Zero-norm/NULL vectors have no cosine and cannot rank.",
)
def v1_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = cosine_topk_bruteforce(emb, queries, k=10)
    return out.select(
        "query_id",
        "vec_id",
        F.round("cosine", 6).alias("cosine"),
        "rank",
    )


def _sql_bucket(vec_expr: str, planes: list[list[float]]) -> str:
    terms = []
    for i, p in enumerate(planes):
        lits = ", ".join(str(x) for x in p)
        terms.append(
            f"(CASE WHEN list_dot_product({vec_expr}, [{lits}]) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


_PLANES = hyperplanes(8, 64)


@register(
    "v2_cosine_topk_lsh",
    f"""
    WITH q AS (
        SELECT vec_id AS query_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id < 5
    ), qb AS (
        SELECT query_id, qv, {_sql_bucket("qv", _PLANES)} AS bucket FROM q
    ), c AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), cb AS (
        SELECT vec_id, v, {_sql_bucket("v", _PLANES)} AS bucket FROM c
    ), scored AS (
        SELECT query_id, vec_id, {_COS} AS cos_raw
        FROM cb JOIN qb USING (bucket)
        WHERE {_COS} IS NOT NULL
    )
    SELECT query_id, vec_id, ROUND(cos_raw, 6) AS cosine,
           CAST(rnk AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos_raw DESC, vec_id
        ) AS rnk FROM scored
    ) WHERE rnk <= 10
    """,
    doc="LSH-bucketed approximate cosine top-10 (identical hyperplanes "
    "embedded in the oracle).",
)
def v2_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = cosine_topk_lsh(emb, queries, k=10, n_planes=8, dim=64)
    return out.select(
        "query_id",
        "vec_id",
        F.round("cosine", 6).alias("cosine"),
        "rank",
    )


# Hamming-radius-2 probe set: own bucket + 8 one-bit + 28 two-bit
# flips (37 probes of 256 buckets). Radius 1 measured recall@5 = 0.28
# on the testdata profile; radius 2 reaches the 0.6 the serve contract
# promises (tests/test_llm_ops.py::test_lsh_multiprobe_recall).
_PROBE_RADIUS = 2
_PROBE_MASKS = probe_masks(8, _PROBE_RADIUS)


@register(
    "v2mp_lsh_multiprobe",
    f"""
    WITH q AS (
        SELECT vec_id AS query_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id < 5
    ), qb0 AS (
        SELECT query_id, qv, {_sql_bucket("qv", _PLANES)} AS bucket FROM q
    ), qb AS (
        -- multi-probe: every bucket within Hamming distance 2 of the
        -- query's own (37 XOR masks); masks distinct => no dup pairs
        SELECT query_id, qv, xor(bucket, t.flip) AS bucket
        FROM qb0, LATERAL unnest({_PROBE_MASKS}) AS t(flip)
    ), c AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), cb AS (
        SELECT vec_id, v, {_sql_bucket("v", _PLANES)} AS bucket FROM c
    ), scored AS (
        SELECT query_id, vec_id, {_COS} AS cos_raw
        FROM cb JOIN qb USING (bucket)
        WHERE {_COS} IS NOT NULL
    )
    SELECT query_id, vec_id, ROUND(cos_raw, 6) AS cosine,
           CAST(rnk AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos_raw DESC, vec_id
        ) AS rnk FROM scored
    ) WHERE rnk <= 10
    """,
    doc="Multi-probe LSH cosine top-10: each query probes every "
    "bucket within Hamming distance 2 of its own sign-bucket (37 of "
    "256) — candidates grow ~14%-of-corpus, recall@5 0.2 -> 0.6 vs "
    "single-probe v2 (the standard quality knob of sign-bucket LSH; "
    "identical hyperplanes embedded in the oracle, probe expansion "
    "mirrored as an unnest of XOR masks).",
)
def v2mp_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = cosine_topk_lsh(
        emb, queries, k=10, n_planes=8, dim=64,
        probe_hamming=_PROBE_RADIUS,
    )
    return out.select(
        "query_id",
        "vec_id",
        F.round("cosine", 6).alias("cosine"),
        "rank",
    )


@register(
    "v3_embedding_near_dups",
    f"""
    WITH c AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), cb AS (
        SELECT vec_id, v, {_sql_bucket("v", _PLANES)} AS bucket FROM c
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.v, b.v) /
                 NULLIF(sqrt(list_dot_product(a.v, a.v)) *
                        sqrt(list_dot_product(b.v, b.v)), 0), 6) AS cosine
    FROM cb a JOIN cb b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) /
          NULLIF(sqrt(list_dot_product(a.v, a.v)) *
                 sqrt(list_dot_product(b.v, b.v)), 0) >= 0.35
    """,
    doc="Embedding-cosine near-dup pairs via LSH self-join.",
)
def v3_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = embedding_near_dup_pairs(
        table(spark, sf_dir, "embeddings"), threshold=0.35, n_planes=8,
        dim=64,
    )
    return out.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )


# ---------------------------------------------------------------------------
# V5 — int8 embedding quantization: per-vector min/max linear
# quantization (4x storage compression before ANN serving). floor
# keeps every step the same IEEE double op on both engines — no
# round-half hazard — so the oracle is exact without any rounding.
# Output exploded to scalars (vec_id, idx, qval, lo, hi): the driver
# hashes scalar columns, and 500 x 64 rows is nothing.
# ---------------------------------------------------------------------------
@register(
    "v5_quantize_embeddings",
    """
    WITH t AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), b AS (
        SELECT vec_id, v,
               list_aggregate(v, 'min') AS lo,
               list_aggregate(v, 'max') AS hi
        FROM t
    )
    SELECT vec_id,
           CAST(idx AS INT) AS idx,
           CASE WHEN hi = lo THEN 0
                ELSE CAST(least(floor(
                    (v[idx + 1] - lo) / (hi - lo) * 255), 255) AS INT)
           END AS qval,
           ROUND(lo, 6) AS lo,
           ROUND(hi, 6) AS hi
    FROM b,
         LATERAL (SELECT unnest(range(0, len(v))) AS idx)
    """,
    doc="Per-vector min/max int8 quantization of the embedding "
    "column: q = floor((x-lo)/(hi-lo)*255) — the storage/bandwidth "
    "compression pass an embedding store runs before ANN serving; "
    "flat vectors quantize to zeros. Pure column expressions, "
    "scan-bound.",
)
def v5_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.similarity import (
        quantize_embeddings,
    )

    q = quantize_embeddings(table(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        F.posexplode("qvec").alias("idx", "qval"),
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
    )


@register(
    "v4_cosine_topk_ivf",
    None,  # KMeans centroids not reproducible in SQL -> rows-only
    doc="IVF (KMeans-partitioned) approximate cosine top-k.",
)
def v4_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    from garmin_data_pipeline_spark.operators.similarity import (
        cosine_topk_ivf,
    )

    # sample_fraction: the registered plan is the scale plan — KMeans
    # fits on a seeded half-sample; the full corpus is only transformed.
    out = cosine_topk_ivf(
        emb, queries, k=10, n_centroids=8, n_probe=3, sample_fraction=0.5
    )
    return out.select(
        "query_id",
        "vec_id",
        F.round("cosine", 6).alias("cosine"),
        "rank",
    ).orderBy("query_id", "rank")


def _cent_values_sql(cents: list[list[float]]) -> str:
    """DuckDB VALUES rows for the grid codebook — the literals are the
    exact 6-decimal strings :func:`grid_centroids` rounded to, so both
    engines parse identical doubles."""
    rows = ", ".join(
        f"({i}, [{', '.join(repr(x) for x in row)}]::DOUBLE[])"
        for i, row in enumerate(cents)
    )
    return rows


_GRID_CELLS = 8
_GRID_PROBE = 2
_GRID = grid_centroids(_GRID_CELLS, 64)


@register(
    "v4p_cosine_topk_ivf_grid",
    f"""
    WITH q AS (
        SELECT vec_id AS query_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id < 5
    ), c AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), cent(cell, cv) AS (
        VALUES {_cent_values_sql(_GRID)}
    ), qc AS (
        -- probe: the n_probe nearest cells per query (dot vs codebook)
        SELECT query_id, qv, cell FROM (
            SELECT query_id, qv, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY list_dot_product(qv, cv) DESC, cell
                   ) AS crank
            FROM q CROSS JOIN cent
        ) WHERE crank <= {_GRID_PROBE}
    ), assigned AS (
        -- coarse quantization: every corpus vector -> max-dot cell
        SELECT vec_id, v, cell FROM (
            SELECT vec_id, v, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id
                       ORDER BY COALESCE(list_dot_product(v, cv), -1e300)
                                DESC, cell
                   ) AS arank
            FROM c CROSS JOIN cent
        ) WHERE arank = 1
    ), scored AS (
        SELECT query_id, vec_id, {_COS} AS cos_raw
        FROM assigned JOIN qc USING (cell)
        WHERE {_COS} IS NOT NULL
    )
    SELECT query_id, vec_id, ROUND(cos_raw, 6) AS cosine,
           CAST(rnk AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos_raw DESC, vec_id
        ) AS rnk FROM scored
    ) WHERE rnk <= 10
    """,
    doc="IVF top-k with the deterministic grid codebook: the "
    "hash-matched twin of v4 (same assign/probe/rerank plumbing; the "
    "KMeans fit — not reproducible in DuckDB — swapped for a fixed "
    "pseudo-random codebook both engines embed as literals). v4 stays "
    "the production fit; this row certifies the IVF machinery.",
)
def v4p_cosine_topk_ivf_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.similarity import (
        cosine_topk_ivf_grid,
    )

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = cosine_topk_ivf_grid(
        emb, queries, k=10, n_cells=_GRID_CELLS, n_probe=_GRID_PROBE
    )
    return out.select(
        "query_id",
        "vec_id",
        F.round("cosine", 6).alias("cosine"),
        "rank",
    )


# ---------------------------------------------------------------------------
# Bench-only ANN serve-path variants (NOT registered — wired into
# bench.py's overrides). The registered v1/v2/v4 share a tiny Q=5
# query batch for oracle comparability, and at Q=5 the index overhead
# dominates: brute force wins. The shape a 100 TB deployment actually
# runs is a large query batch against a standing index, so the bench
# also times Q=500:
#   - brute @ Q=500 extrapolates to ~40 s at sf0.1 (measured 7.9 s at
#     Q=100; cost is linear in Q) — the motivation for the ANN paths,
#     not a useful recurring bench entry;
#   - LSH @ Q=500 ~ 2 s (256 sign buckets -> ~8 candidates/query);
#   - IVF @ Q=500 serves from a WARM index (built once per session,
#     persisted — the build is the offline cost write_ivf_index
#     amortizes across query batches; bench spread shows the cold
#     first repeat). 64 cells / 4 probes => 1/16 of the corpus scored
#     per query.
# ---------------------------------------------------------------------------
_ANN_SERVE_Q = 500
_IVF_SERVE_CACHE: dict[str, tuple[DataFrame, DataFrame]] = {}


def _serve_queries(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") < _ANN_SERVE_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )


def d5_groups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only: the composition a 100 TB dedup pipeline actually
    runs — MinHash-LSH candidate pairs (d3's scale path, not d2's
    O(df^2) exact verifier) resolved into duplicate groups by the
    components loop. Registered d5 keeps the d2 input because exact
    Jaccard is what the recursive-CTE oracle can mirror."""
    from garmin_data_pipeline_spark.operators.dedup_scale import (
        minhash_lsh_pairs,
    )
    from garmin_data_pipeline_spark.operators.graph import (
        duplicate_groups,
    )

    pairs = minhash_lsh_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    )
    return duplicate_groups(pairs, "doc_a", "doc_b")


def v2_lsh_serve_q500(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return cosine_topk_lsh(
        emb, _serve_queries(emb), k=10, n_planes=8, dim=64
    )


def v2mp_lsh_serve_q500(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only: the multi-probe serve shape (v2mp's plan at Q=500).
    Candidates grow ~14%-of-corpus (radius-2 probe set) vs v2's
    ~0.4%; this entry prices the recall knob (0.2 -> 0.6 recall@5) so
    the v2/v2mp tradeoff is a measured number."""
    emb = table(spark, sf_dir, "embeddings")
    return cosine_topk_lsh(
        emb, _serve_queries(emb), k=10, n_planes=8, dim=64,
        probe_hamming=_PROBE_RADIUS,
    )


_INT8_SERVE_CACHE: dict[str, DataFrame] = {}


def v5_int8_serve_q500(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only: ANN serving from the int8-quantized LSH index — the
    consumer the v5 quantizer exists for. The index (qvec8 tinyint
    array + lo/hi + bucket + precomputed norm: ~1/8 the bytes of the
    float corpus) is built once per session and persisted; each serve
    dequantizes ONLY bucket-join candidates. Multi-probe on: quantized
    serving is the recall-per-byte play, so it runs the quality knob."""
    from garmin_data_pipeline_spark.operators.similarity import (
        build_quantized_lsh_index,
        search_quantized_lsh,
    )

    if sf_dir not in _INT8_SERVE_CACHE:
        emb = table(spark, sf_dir, "embeddings")
        _INT8_SERVE_CACHE[sf_dir] = build_quantized_lsh_index(
            emb, n_planes=8, dim=64
        ).persist()
    index = _INT8_SERVE_CACHE[sf_dir]
    emb = table(spark, sf_dir, "embeddings")
    return search_quantized_lsh(
        index, _serve_queries(emb), k=10, n_planes=8, dim=64,
        probe_hamming=_PROBE_RADIUS,
    )


# ---------------------------------------------------------------------------
# Probe-only INDEX BUILD paths (r8 verdict directive 5): the serve
# walls are priced per-round, but every serve tier amortizes an
# offline build ("the build is the expensive part" —
# similarity.build_ivf_index) — these functions time that claim.
# Each is a FRESH build (no serve cache) returning the index
# DataFrame, so tools/scale_probe.py can wall-clock it at sf0.1 and
# the 10x replica: the v2 corpus hash pass, the v4 IVF KMeans
# fit+transform, the v8t trained-codebook fit+encode, and the v9
# IVFADC build in both flat and product-assignment forms (the probe
# ratio between those two is directive 6's deliverable — the flat
# transform is n x C full-dim dots, the product one n x 2*sqrt(C)
# half-dim distances).
# ---------------------------------------------------------------------------
def v2_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One corpus pass: LSH sign-bucket + precomputed norm — the
    standing index v2/v2mp serve from."""
    from garmin_data_pipeline_spark.operators.similarity import (
        _norm,
        as_double_array,
        hyperplanes,
        lsh_bucket,
    )

    emb = table(spark, sf_dir, "embeddings")
    v = as_double_array("embedding")
    planes = hyperplanes(8, 64)
    return emb.filter(
        F.col("embedding").isNotNull() & (F.size("embedding") >= 64)
    ).select(
        "vec_id",
        lsh_bucket(v, planes).alias("bucket"),
        v.alias("v"),
        _norm(v).alias("norm"),
    )


def v4_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF build: sample KMeans fit + one full-corpus transform —
    the same parameters v4_ivf_serve_q500 amortizes."""
    from garmin_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
    )

    emb = table(spark, sf_dir, "embeddings")
    assigned, _ = build_ivf_index(
        emb, n_centroids=64, sample_fraction=0.5
    )
    return assigned


def v8t_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-PQ build: m sample KMeans fits + one encode pass —
    what v8t_pq_serve_q500 amortizes."""
    from garmin_data_pipeline_spark.operators.similarity import (
        build_pq_lsh_index,
        fit_pq_codebooks,
    )

    emb = table(spark, sf_dir, "embeddings")
    books = fit_pq_codebooks(
        emb, m=_PQ_M, k=_PQ_K, subdim=_PQ_SUBDIM, sample_fraction=0.1
    )
    return build_pq_lsh_index(emb, n_planes=8, dim=64, books=books)


def v9_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC build, flat coarse transform (n x C full-dim dots) —
    what v9/v9r serve from."""
    from garmin_data_pipeline_spark.operators.similarity import (
        build_ivf_pq_index,
    )

    emb = table(spark, sf_dir, "embeddings")
    index, _, _ = build_ivf_pq_index(
        emb, n_centroids=64, sample_fraction=0.1,
        m=_PQ_M, k=_PQ_K, subdim=_PQ_SUBDIM,
    )
    return index


def st8_overlap_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-only (r9 verdict directive 6): st8's BATCH twin at its
    production shape — per-event-type LEAD state intervals capped at
    the 7-day state bound, then the bin-bucketed interval overlap
    join ``overlap_intervals`` runs for batch frames. The streaming
    side's state is micro-batch-bounded by construction once the cap
    holds (watermark + cap ages both stores), so pricing the batch
    twin prices the per-batch work the stream re-executes; the cap
    filter itself is one scan-side predicate. st8's semantics are
    pytest-certified (stream-vs-batch equivalence,
    tests/test_streaming_sinks.py); this entry supplies the missing
    sf0.1 -> sf1.0 wall ratio in sf1_probe.json."""
    from pyspark.sql.window import Window

    from garmin_data_pipeline_spark.streaming.events import (
        overlap_intervals,
    )

    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")

    def intervals(etype: str, s: str, e: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .select(
                "user_id",
                F.col("ts").alias(s),
                F.lead("ts").over(w).alias(e),
            )
            .filter(F.col(e).isNotNull())
        )

    return overlap_intervals(
        intervals("click", "click_start", "click_end"),
        intervals("view", "view_start", "view_end"),
        "click_start", "click_end", "view_start", "view_end",
        by=("user_id",),
        max_interval_minutes=7 * 24 * 60,
    )


def v9pr_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC build with the inverted-multi-index coarse quantizer
    (n x 2*sqrt(C) half-dim distances) — directive 6's scale path."""
    from garmin_data_pipeline_spark.operators.similarity import (
        build_ivf_pq_index,
    )

    emb = table(spark, sf_dir, "embeddings")
    index, _, _ = build_ivf_pq_index(
        emb, n_centroids=64, sample_fraction=0.1,
        m=_PQ_M, k=_PQ_K, subdim=_PQ_SUBDIM,
        product_assignment=True,
    )
    return index


def v4_ivf_serve_q500(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        search_ivf,
    )

    if sf_dir not in _IVF_SERVE_CACHE:
        emb = table(spark, sf_dir, "embeddings")
        assigned, cents = build_ivf_index(
            emb, n_centroids=64, sample_fraction=0.5
        )
        _IVF_SERVE_CACHE[sf_dir] = (assigned.persist(), cents)
    assigned, cents = _IVF_SERVE_CACHE[sf_dir]
    emb = table(spark, sf_dir, "embeddings")
    return search_ivf(assigned, cents, _serve_queries(emb), k=10, n_probe=4)


# ---------------------------------------------------------------------------
# Multimodal: binary payload + Arrow-batched fake decode.
# ---------------------------------------------------------------------------
@register(
    "m1_multimodal_metadata",
    """
    WITH t AS (
        -- NULL text decodes like an empty payload (the kernel maps
        -- p or b'' before decoding), and an empty payload still has
        -- metadata: checksum of no bytes is 0, not NULL.
        SELECT doc_id,
               octet_length(encode(COALESCE(text, ''))) AS n_bytes,
               COALESCE(CAST(list_sum(list_transform(
                   generate_series(1,
                       least(64, length(COALESCE(text, '')))),
                   i -> ascii(substr(text, i, 1))
               )) AS BIGINT), 0) AS checksum
        FROM documents
    )
    SELECT doc_id,
           'application/octet-stream' AS media_type,
           CAST(16 + (checksum % 64) AS INT) AS width,
           CAST(16 + (n_bytes % 64) AS INT) AS height,
           n_bytes,
           'fake' AS format
    FROM t
    """,
    doc="Binary payload column + mapInPandas metadata decode (fake "
    "kernel; real plumbing: Arrow batches, schema, partitioning).",
)
def m1_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    assets = attach_binary_payload(docs, "text")
    decoded = decode_image_metadata(assets, "payload")
    return decoded.select(
        "doc_id", "media_type", "width", "height", "n_bytes", "format"
    )


# ---------------------------------------------------------------------------
# M2 — video-style frame sampling: 1 asset row -> N frame rows via an
# exploding mapInPandas kernel (codec stubbed; frame arithmetic is the
# oracle-checkable part: frame_len = min(size, n_bytes - idx*size)).
# ---------------------------------------------------------------------------
@register(
    "m2_frame_sampling",
    """
    WITH t AS (
        SELECT doc_id, octet_length(encode(text)) AS n_bytes
        FROM documents
    )
    SELECT doc_id,
           idx AS frame_idx,
           LEAST(256, n_bytes - idx * 256) AS frame_len
    FROM t,
         LATERAL (
            SELECT unnest(range(0,
                CAST(ceil(n_bytes / 256.0) AS BIGINT), 2)) AS idx
         )
    """,
    doc="Frame sampling: exploding mapInPandas kernel (every 2nd "
    "256-byte frame of the payload; fake codec, real plumbing).",
)
def m2_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.multimodal import (
        sample_video_frames,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    assets = attach_binary_payload(docs, "text").select("doc_id", "payload")
    frames = sample_video_frames(assets, frame_size=256, every_n=2)
    return frames.select("doc_id", "frame_idx", "frame_len")


@register(
    "m3_audio_windows",
    """
    WITH t AS (
        SELECT doc_id, octet_length(encode(text)) AS n_bytes
        FROM documents
        -- empty/NULL payloads have no windows (DuckDB's greatest()
        -- IGNORES a NULL argument, so without this filter a NULL text
        -- would fabricate a window the Spark plan never emits)
        WHERE octet_length(encode(text)) > 0
    )
    SELECT doc_id,
           start // 256 AS window_idx,
           LEAST(512, n_bytes - start) AS window_len
    FROM t,
         LATERAL (
            SELECT unnest(range(0,
                greatest(n_bytes - 256, 1), 256)) AS start
         )
    """,
    doc="Overlapping audio windowing (512-byte windows, 256-byte hop "
    "— 50% overlap, the STFT front-end shape): exploded sequence + "
    "JVM-side substring slices, no Python in the plan; windows "
    "emitted only while they contribute new bytes (the chunker's "
    "no-redundant-tail rule). Fake codec, real plumbing.",
)
def m3_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.multimodal import (
        window_audio,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    assets = attach_binary_payload(docs, "text").select("doc_id", "payload")
    wins = window_audio(assets, window_bytes=512, hop_bytes=256)
    return wins.select("doc_id", "window_idx", "window_len")


@register(
    "m4_frame_checksums",
    """
    WITH t AS (
        SELECT doc_id, text, octet_length(encode(text)) AS n_bytes
        FROM documents
    )
    -- md5 over a VARCHAR slice equals the Spark kernel's md5 over the
    -- frame BYTES only because this corpus is pure ASCII — ENFORCED by
    -- tests/test_llm_ops.py::test_m4_oracle_ascii_precondition over
    -- every generated sf dir (octet_length == char length for all
    -- docs); the Spark side hashes raw bytes and is corpus-agnostic.
    SELECT doc_id,
           idx AS frame_idx,
           LEAST(256, n_bytes - idx * 256) AS frame_len,
           md5(substring(text, idx * 256 + 1, 256)) AS frame_md5
    FROM t,
         LATERAL (
            SELECT unnest(range(0,
                CAST(ceil(n_bytes / 256.0) AS BIGINT), 2)) AS idx
         )
    """,
    doc="Per-frame decode through the decode_frames Arrow boundary: "
    "frames are sliced JVM-side (m2's plan), then ONLY the frame "
    "bytes cross into an Arrow-batched pandas kernel that computes a "
    "deterministic md5 per frame — the canned stand-in for a real "
    "ffmpeg/PIL decode, exercising the exact plumbing (batch shape, "
    "schema contract, binary transfer) a real codec would use.",
)
def m4_frame_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.multimodal import (
        checksum_frames,
        sample_video_frames,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    assets = attach_binary_payload(docs, "text").select("doc_id", "payload")
    frames = sample_video_frames(assets, frame_size=256, every_n=2)
    return checksum_frames(
        frames.select("doc_id", "frame_idx", "frame_len", "frame")
    )


# ---------------------------------------------------------------------------
# M5 — REAL image decode certified by an analytic oracle. Each doc is
# rendered as a genuine binary netpbm P6 payload (header + raw pixels,
# built as pure column expressions — pixels are the doc's text rpad'ed
# to exactly width*height*3 bytes), then the real decoder
# (functions/codecs.decode_netpbm via decode_image_stats) parses the
# header grammar and raster and reports integer pixel stats. The
# oracle never sees the payload: it predicts width/height from the
# doc_id formula and px_sum as the ascii-code sum of the same rpad'ed
# text — so a hash match proves the DECODER (header parse, raster
# shape, channel sum) is exact, the m-family's step past m1-m4's
# fake-kernel arithmetic. ASCII corpus precondition (byte == char) is
# the same one m4 pins via test_m4_oracle_ascii_precondition.
# ---------------------------------------------------------------------------
@register(
    "m5_image_stats",
    """
    WITH t AS (
        SELECT doc_id,
               CAST(8 + doc_id % 8 AS INT) AS width,
               CAST(8 + doc_id % 5 AS INT) AS height,
               rpad(COALESCE(text, ''),
                    CAST((8 + doc_id % 8) * (8 + doc_id % 5) * 3 AS INT),
                    'x') AS px
        FROM documents
    )
    SELECT doc_id, width, height,
           'ppm' AS format,
           CAST(list_sum(list_transform(
               generate_series(1, width * height * 3),
               i -> ascii(substr(px, i, 1))
           )) AS BIGINT) AS px_sum
    FROM t
    """,
    doc="REAL image decode (pure-stdlib netpbm codec) hash-certified "
    "against an analytic oracle: P6 payloads are built as column "
    "expressions, decoded for real in an Arrow-batched kernel, and "
    "the oracle predicts the decoded width/height/px_sum without "
    "ever parsing bytes. Scale shape: one scan, one mapInPandas — "
    "no shuffle at all.",
)
def m5_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.multimodal import (
        decode_image_stats,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    header = F.format_string(
        "P6\n%d %d\n255\n",
        F.expr("CAST(8 + doc_id % 8 AS INT)"),
        F.expr("CAST(8 + doc_id % 5 AS INT)"),
    )
    px = F.expr(
        "rpad(coalesce(text, ''), "
        "(8 + doc_id % 8) * (8 + doc_id % 5) * 3, 'x')"
    )
    assets = docs.select(
        "doc_id",
        F.concat(
            F.encode(header, "UTF-8"), F.encode(px, "UTF-8")
        ).alias("payload"),
    )
    return decode_image_stats(assets, "payload").select(
        "doc_id", "width", "height", "format", "px_sum"
    )


# ---------------------------------------------------------------------------
# M6 — REAL WAV round-trip certified by an analytic oracle. Each doc
# becomes a genuine RIFF/WAVE PCM16 payload (stdlib wave writer) whose
# samples follow a closed-form formula of (doc_id, i); the independent
# manual RIFF parser (functions/codecs.decode_wav) decodes it and
# reports exact int64 amplitude stats. The oracle predicts
# n_frames/amp_sum/amp_sq_sum from the formula alone — a hash match
# certifies the whole container round-trip: header fields, chunk
# walk, PCM16 little-endian sample decode, and the stats arithmetic.
# ---------------------------------------------------------------------------
@register(
    "m6_audio_features",
    """
    WITH t AS (
        SELECT doc_id, 64 + doc_id % 64 AS n FROM documents
    )
    SELECT doc_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(1 AS INT) AS n_channels,
           CAST(n AS BIGINT) AS n_frames,
           CAST(list_sum(list_transform(
               generate_series(0, n - 1),
               i -> (doc_id * 7 + i * 13) % 2048 - 1024
           )) AS BIGINT) AS amp_sum,
           CAST(list_sum(list_transform(
               generate_series(0, n - 1),
               i -> ((doc_id * 7 + i * 13) % 2048 - 1024)
                    * ((doc_id * 7 + i * 13) % 2048 - 1024)
           )) AS BIGINT) AS amp_sq_sum
    FROM t
    """,
    doc="REAL WAV round-trip (stdlib wave writer -> independent "
    "manual RIFF/PCM16 parser) hash-certified against an analytic "
    "oracle that predicts frame counts and exact int64 amplitude "
    "sums from the sample formula. Scale shape: one scan, two "
    "Arrow-batched kernels (encode, decode) — no shuffle at all.",
)
def m6_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from garmin_data_pipeline_spark.operators.multimodal import (
        decode_audio_features,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def encode_kernel(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from garmin_data_pipeline_spark.functions.codecs import encode_wav

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                n = 64 + int(doc_id) % 64
                i = np.arange(n, dtype=np.int64)
                s = (int(doc_id) * 7 + i * 13) % 2048 - 1024
                payloads.append(
                    encode_wav(s.astype(np.int16), 8000, 1)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    assets = docs.mapInPandas(
        encode_kernel, schema="doc_id bigint, payload binary"
    )
    return decode_audio_features(assets, "payload").select(
        "doc_id", "sample_rate", "n_channels", "n_frames",
        "amp_sum", "amp_sq_sum",
    )


# ---------------------------------------------------------------------------
# M7 — REAL video frame decode certified by an analytic oracle, over
# a MIXED corpus the decoder routes by magic bytes: even doc_ids
# become genuine uncompressed AVIs (RIFF container, 24-bit DIB '00db'
# frame chunks) with pixel (f, y, x, c) = d + f + y + x + c; odd
# doc_ids become genuine animated GIF89a (real LZW compression,
# 128-entry grayscale palette) with palette index (f, y, x) =
# d + f + y + x, where d = doc_id % 50 — every value < 128, so
# nothing wraps and the per-frame pixel sum has the closed form
#   3*w*h*(d + f) + 3*h*w*(w-1)/2 + 3*w*h*(h-1)/2  (+ 3*w*h for AVI,
#   whose per-channel +c term GIF's single index lacks)
# and the oracle is pure arithmetic (never parses a byte). The real
# decoder (codecs.decode_video via decode_video_frames) sniffs the
# container, walks RIFF/strf + DIB rasters for AVI and LZW streams +
# palette compositing for GIF, samples every 2nd frame, and reports
# exact int64 pixel sums — one hash match certifies BOTH container
# walks, both raster decoders, the LZW implementation, the format
# router, and the sampling arithmetic. Inter-frame codecs stay out
# of scope (decode_avi raises on '..dc' chunks).
# ---------------------------------------------------------------------------
@register(
    "m7_video_frame_stats",
    """
    WITH t AS (
        SELECT doc_id,
               doc_id % 50 AS d,
               CAST(8 + doc_id % 4 AS INT) AS w,
               CAST(6 + doc_id % 3 AS INT) AS h,
               3 + doc_id % 4 AS nf
        FROM documents
    )
    SELECT doc_id,
           f AS frame_idx,
           w AS width,
           h AS height,
           CAST(nf AS BIGINT) AS n_frames,
           CAST(3 * w * h * (d + f)
                + 3 * h * (w * (w - 1) // 2)
                + 3 * w * (h * (h - 1) // 2)
                + CASE WHEN doc_id % 2 = 0 THEN 3 * w * h ELSE 0 END
                AS BIGINT) AS px_sum
    FROM t,
         LATERAL (SELECT unnest(range(0, nf, 2)) AS f)
    """,
    doc="REAL video frame decode over a mixed AVI/GIF corpus "
    "(pure-stdlib codecs: RIFF walk + DIB rasters, LZW + palette "
    "compositing, magic-byte routing) hash-certified against a "
    "closed-form oracle predicting each sampled frame's exact pixel "
    "sum. Scale shape: one scan, two Arrow-batched kernels (encode, "
    "decode+explode) — no shuffle at all.",
)
def m7_video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from garmin_data_pipeline_spark.operators.multimodal import (
        decode_video_frames,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def encode_kernel(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from garmin_data_pipeline_spark.functions.codecs import (
            encode_avi,
            encode_gif,
        )

        gray = np.arange(128, dtype=np.uint8)
        palette = np.stack([gray, gray, gray], axis=1)
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                d, w = did % 50, 8 + did % 4
                h, nf = 6 + did % 3, 3 + did % 4
                f = np.arange(nf)[:, None, None]
                y = np.arange(h)[None, :, None]
                x = np.arange(w)[None, None, :]
                if did % 2 == 0:
                    c = np.arange(3)[None, None, None, :]
                    frames = (
                        (d + f + y + x)[..., None] + c
                    ).astype(np.uint8)
                    payloads.append(encode_avi(frames, fps=10))
                else:
                    idx = (d + f + y + x).astype(np.uint8)
                    payloads.append(encode_gif(idx, palette))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    assets = docs.mapInPandas(
        encode_kernel, schema="doc_id bigint, payload binary"
    )
    return decode_video_frames(assets, "payload", every_n=2).select(
        "doc_id", "frame_idx", "width", "height", "n_frames", "px_sum"
    )


# ---------------------------------------------------------------------------
# T14 — Gopher-style repetition metrics: fraction of duplicate word
# n-grams per document (Rae et al. 2021 §A1.1 quality rules). A doc
# that repeats itself has distinct-ngrams << total-ngrams; the
# filters drop docs above a dup-fraction threshold. Row-local array
# math only — scan-bound at any corpus size.
# ---------------------------------------------------------------------------
def _sql_dup_frac(n: int) -> str:
    sh = T.sql_shingles(_TOKS, n)
    return (
        f"CASE WHEN len({_TOKS}) >= {n} THEN "
        f"ROUND(1.0 - len({sh}) / (len({_TOKS}) - {n} + 1), 6) "
        f"ELSE 0.0 END"
    )


@register(
    "t14_repetition_metrics",
    f"""
    SELECT doc_id,
           len({_TOKS}) AS n_tokens,
           {_sql_dup_frac(2)} AS dup_2gram_frac,
           {_sql_dup_frac(3)} AS dup_3gram_frac,
           {_sql_dup_frac(4)} AS dup_4gram_frac
    FROM documents
    """,
    doc="Gopher repetition rules: per-doc duplicate word 2/3/4-gram "
    "fractions (1 - distinct/total; 0 for docs shorter than the "
    "n-gram). Row-local tokenize + distinct-shingle counts — no "
    "shuffle, no window.",
)
def t14_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.text import (
        shingles_from_tokens,
        tokens,
    )

    # tokenize ONCE into a column (r14, guide §1.2 step 2): the
    # shingle subtrees live in when-branches — exempt from codegen
    # CSE — so inlined tokens(text) re-ran the tokenizer per n-gram
    # size (measured 34 tokenizer-regex copies in the plan, 2.3s ->
    # 0.9s at sf0.1 with the column; values identical)
    docs = table(spark, sf_dir, "documents").withColumn(
        "__toks", tokens(F.col("text"))
    )
    n_toks = F.size(F.col("__toks"))

    def dup_frac(n: int):
        total = n_toks - n + 1
        return F.when(
            n_toks >= n,
            F.round(
                1.0
                - F.size(shingles_from_tokens(F.col("__toks"), n))
                / total,
                6,
            ),
        ).otherwise(F.lit(0.0))

    return docs.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        dup_frac(2).alias("dup_2gram_frac"),
        dup_frac(3).alias("dup_3gram_frac"),
        dup_frac(4).alias("dup_4gram_frac"),
    )


# ---------------------------------------------------------------------------
# T15 — vocabulary top-k: corpus-wide token frequencies, top 100 by
# count with deterministic tiebreak (tokenizer-training prep). The
# explode -> hash-aggregate has map-side partials; the top-k is
# TakeOrderedAndProject (per-partition heads + tiny driver merge),
# never a global sort or window.
# ---------------------------------------------------------------------------
@register(
    "t15_vocab_topk",
    f"""
    WITH tok AS (
        SELECT UNNEST({_TOKS}) AS token FROM documents
    )
    SELECT token, COUNT(*) AS cnt
    FROM tok
    GROUP BY token
    ORDER BY cnt DESC, token
    LIMIT 100
    """,
    doc="Corpus vocabulary top-100 by token frequency (tokenizer "
    "training prep): explode + map-side-partial hash aggregate + "
    "TakeOrderedAndProject.",
)
def t15_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.text import tokens

    return (
        table(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.col("token"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# C1 — train/eval contamination scan (decontamination): train docs
# sharing a distinct 8-gram with any eval doc. Split by doc_id residue
# (deterministic, oracle-expressible); 8-gram is the standard
# decontamination config — long enough that overlap means copying.
# ---------------------------------------------------------------------------
_SH8 = T.sql_shingles(_TOKS, 8)
_C1_MAX_DF = 50


@register(
    "c1_contamination",
    f"""
    WITH tr AS (
        SELECT doc_id, UNNEST({_SH8}) AS s
        FROM documents WHERE doc_id % 10 != 0
    ), te0 AS (
        SELECT doc_id AS test_id, UNNEST({_SH8}) AS s
        FROM documents WHERE doc_id % 10 = 0
    ), keep AS (
        SELECT s FROM te0 GROUP BY s HAVING COUNT(*) <= {_C1_MAX_DF}
    ), te AS (
        SELECT test_id, te0.s FROM te0 JOIN keep USING (s)
    ), tot AS (
        SELECT doc_id, len({_SH8}) AS ngram_total
        FROM documents WHERE doc_id % 10 != 0
    ), hits AS (
        SELECT tr.doc_id,
               COUNT(DISTINCT tr.s) AS shared_ngrams,
               COUNT(DISTINCT test_id) AS test_docs
        FROM tr JOIN te USING (s)
        GROUP BY tr.doc_id
    )
    SELECT doc_id, shared_ngrams, test_docs, ngram_total,
           ROUND(shared_ngrams / ngram_total, 6) AS overlap_frac
    FROM hits JOIN tot USING (doc_id)
    """,
    doc="Decontamination scan: train docs (doc_id % 10 != 0) sharing "
    "a distinct word 8-gram with any eval doc (residue 0). Inverted "
    "index over the SMALL eval corpus probed by the big train side — "
    "O(shared shingles) join rows, never O(docs^2); stop-shingle "
    "max_df cap on the eval side.",
)
def c1_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.contamination import (
        ngram_contamination,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    test = docs.filter(F.col("doc_id") % 10 == 0)
    out = ngram_contamination(
        train, test, n=8, max_df=_C1_MAX_DF
    )
    return out.withColumn(
        "ngram_total", F.col("ngram_total").cast("long")
    )


# ---------------------------------------------------------------------------
# T4 — corpus length profile: exact quantiles of per-doc token counts
# (the pre-training data-profiling step that sizes truncation/packing).
# Spark `percentile` and DuckDB `quantile_cont` both do exact linear
# interpolation -> hash-identical.
# ---------------------------------------------------------------------------
@register(
    "t4_length_quantiles",
    f"""
    WITH t AS (
        SELECT len({_TOKS}) AS n_tokens FROM documents
    )
    SELECT COUNT(*) AS n_docs,
           CAST(quantile_cont(n_tokens, 0.5) AS DOUBLE) AS p50,
           CAST(quantile_cont(n_tokens, 0.9) AS DOUBLE) AS p90,
           CAST(quantile_cont(n_tokens, 0.99) AS DOUBLE) AS p99,
           MIN(n_tokens) AS min_tokens,
           MAX(n_tokens) AS max_tokens
    FROM t
    """,
    doc="Exact token-count quantiles over the corpus (length profile).",
)
def t4_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    n = T.token_count(F.col("text")).alias("n_tokens")
    return (
        docs.select(n)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.percentile(F.col("n_tokens"), F.lit(0.5)).alias("p50"),
            F.percentile(F.col("n_tokens"), F.lit(0.9)).alias("p90"),
            F.percentile(F.col("n_tokens"), F.lit(0.99)).alias("p99"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# T5 — corpus mixing: per-language deterministic sampling rates (the
# data-mixing step of a pretraining pipeline; reproducible across runs
# and engines because the "randomness" is a key residue, not an RNG).
# ---------------------------------------------------------------------------
@register(
    "t5_corpus_mix",
    f"""
    WITH t AS (
        SELECT doc_id, text, {_TOKS} AS toks FROM documents
    ), langd AS (
        SELECT doc_id, {_sql_langid()} AS lang FROM t
    )
    SELECT doc_id, lang
    FROM langd
    WHERE doc_id % 100 < CASE WHEN lang = 'en' THEN 50 ELSE 100 END
    """,
    doc="Language-stratified deterministic downsampling (data mixing).",
)
def t5_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.sampling import corpus_mix

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", T.language_guess(F.col("text")).alias("lang")
    )
    return corpus_mix(docs, "doc_id", "lang", {"en": 0.5})


# ---------------------------------------------------------------------------
# T13 — dataset-card split + deterministic shuffle: salted-hash
# train/val/test assignment (decorrelated from id assignment order,
# resplittable by salt) and the salted shuffle key a reproducible
# training order sorts by. No window, no RNG: one md5 per row.
# ---------------------------------------------------------------------------
_T13_SPLIT_HASH = sql_base_hash32("CAST(doc_id AS VARCHAR) || '#split-v1'")
_T13_SHUF_HASH = sql_base_hash32(
    "CAST(doc_id AS VARCHAR) || '#shuffle-v1'"
)


@register(
    "t13_hash_split",
    f"""
    WITH t AS (
        SELECT doc_id,
               {_T13_SPLIT_HASH} % 10000 AS b,
               {_T13_SHUF_HASH} AS shuffle_key
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN b < 9000 THEN 'train'
                WHEN b < 9500 THEN 'val'
                ELSE 'test' END AS split,
           shuffle_key
    FROM t
    """,
    doc="Salted-hash 90/5/5 train/val/test split plus the "
    "deterministic shuffle key (range-partition + sort, no global "
    "window): the dataset-card split and reproducible training order "
    "in one pass.",
)
def t13_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.sampling import (
        hash_split,
        shuffle_order,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    out = hash_split(
        docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    return shuffle_order(out, "doc_id").select(
        "doc_id", "split", "shuffle_key"
    )


# ---------------------------------------------------------------------------
# Shared crawl-fixture helpers (s14 / s15 / e2e_crawl): ONE archive
# builder and ONE escape chain, so a fix to the framing or the
# entity escaping can never drift between the stage queries and the
# fused pipeline that claims to compose them (r12 review finding).
# ---------------------------------------------------------------------------
def _escape_html(col):
    """&/</> escape — & FIRST so the others' entities survive."""
    esc = F.regexp_replace(
        F.coalesce(col, F.lit("")), "&", "&amp;"
    )
    esc = F.regexp_replace(esc, "<", "&lt;")
    return F.regexp_replace(esc, ">", "&gt;")


def _http_body_expr() -> "F.Column":
    """JVM-side HTTP body split of a parsed WARC record's content."""
    return F.expr(
        "substring(decode(content, 'UTF-8'), "
        "locate('\\r\\n\\r\\n', decode(content, 'UTF-8')) + 4)"
    )


def _warc_fixture_records(docs: DataFrame, content_type: str) -> DataFrame:
    """Pack (doc_id, body) rows into REAL multi-record per-member-
    gzip WARC archives (50 response records each, the CC layout)
    in-query, then re-ingest them through the real parser. Returns
    the parsed record rows (sources/warc.py schema).

    Optional per-fetch columns: ``uri`` (default
    ``http://corpus.example/doc/{doc_id}``) and ``date`` (default
    2026-01-01) — e2e_crawl uses both to plant same-canonical-URL
    re-crawls with distinct fetch times. ``doc_id`` stays the UNIQUE
    fetch key (archive grouping + the deterministic in-archive sort
    need a total order even when two fetches share a URI)."""
    import pandas as pd

    from garmin_data_pipeline_spark.sources.warc import (
        encode_warc,
        records_from_archives,
    )

    extras = [c for c in ("uri", "date") if c in docs.columns]
    docs = docs.select("doc_id", "body", *extras)
    header = (
        f"HTTP/1.1 200 OK\r\nContent-Type: {content_type}\r\n\r\n"
    ).encode("ascii")
    has_uri, has_date = "uri" in extras, "date" in extras

    # r14 optimization (guide §2.4): archives are packed PARTITION-
    # LOCALLY (one mapInPandas pass, ~50 records per archive) instead
    # of shuffling every page body through a groupBy(doc_id/50) +
    # applyInPandas. Which archive a fetch lands in is NOT observable
    # in the parsed output (records_from_archives re-explodes to one
    # row per record with per-record fields only), so the relation —
    # and every oracle built on it — is byte-identical; what the
    # fixture certifies (real multi-record per-member-gzip WARC
    # round-trip through the production parser) is unchanged. The
    # former shuffle moved every HTML body across an Exchange purely
    # to pick archive membership — the guide-§8 anti-pattern.
    def build(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("doc_id")  # deterministic in-batch
            payloads = []
            for start in range(0, len(pdf), 50):
                chunk = pdf.iloc[start : start + 50]
                recs = [
                    {
                        "type": "response",
                        "uri": (
                            str(r.uri)
                            if has_uri
                            else "http://corpus.example/doc/"
                            f"{int(r.doc_id)}"
                        ),
                        "date": (
                            str(r.date)
                            if has_date
                            else "2026-01-01T00:00:00Z"
                        ),
                        "content": header
                        + str(r.body).encode("utf-8"),
                    }
                    for r in chunk.itertuples()
                ]
                # level 1: the archive is re-parsed in the very next
                # stage — deflate effort buys nothing (decoded
                # records are identical at every level); the
                # member-gzip LAYOUT (what s14/e2e certify) is
                # level-independent
                payloads.append(
                    encode_warc(
                        recs, gzip_members=True, compresslevel=1
                    )
                )
            yield pd.DataFrame({"payload": payloads})

    archives = docs.mapInPandas(build, schema="payload binary")
    return records_from_archives(archives, "payload")


def _record_doc_id() -> "F.Column":
    """Recover the doc id the fixture encoded into the record URI."""
    return (
        F.regexp_extract(F.col("target_uri"), r"doc/(\d+)$", 1)
        .cast("bigint")
        .alias("doc_id")
    )


# ---------------------------------------------------------------------------
# S14 — WARC ingestion (ISO 28500, the Common Crawl container): the
# documents table is packed into REAL multi-record per-member-gzip
# WARC archives (50 response records each, the CC layout) inside the
# query, then re-ingested through the real parser
# (sources/warc.py: member-wise gzip walk, Content-Length framing,
# header-block parse) and the HTTP response body is split back out
# JVM-side (locate + substring on the decoded content — no third
# Python pass). The oracle predicts each body's length and md5 from
# the raw text WITHOUT framing a record — a hash match certifies the
# whole ingest path: record framing, gzip member decode, header
# parse, HTTP split, and the uri→doc_id round-trip. ASCII-corpus
# md5 parity per the m4 precondition test.
# ---------------------------------------------------------------------------
@register(
    "s14_warc_scan",
    """
    SELECT doc_id,
           'response' AS warc_type,
           CAST(length(COALESCE(text, '')) AS BIGINT) AS body_len,
           md5(COALESCE(text, '')) AS body_md5
    FROM documents
    """,
    doc="WARC (Common Crawl) ingestion certified end-to-end: real "
    "multi-record gzip-member archives built in the query, re-parsed "
    "by the real framing/gzip/header parser, HTTP bodies split "
    "JVM-side, hash-matched against a no-framing oracle. Scale "
    "shape: one grouped Arrow encode, one Arrow record explode, "
    "pure column expressions after — file-per-task like every "
    "production CC reader.",
)
def s14_warc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(F.col("text"), F.lit("")).alias("body"),
    )
    recs = _warc_fixture_records(docs, "text/plain")
    body = _http_body_expr()
    return recs.filter(F.col("parse_error").isNull()).select(
        _record_doc_id(),
        F.col("warc_type"),
        F.length(body).cast("bigint").alias("body_len"),
        F.md5(F.encode(body, "UTF-8")).alias("body_md5"),
    )


# ---------------------------------------------------------------------------
# S15 — HTML→text extraction (the WET step, VERDICT r11 directive 1):
# the one stage between the WARC scan and the text kit. Certified the
# m5/s14 way: the query BUILDS real HTML from documents.text with
# column expressions (escaped body text, a <script> with a bare '<'
# inside, <style>, a comment, an attribute containing '>', CDATA,
# named/decimal/hex entities incl. the &amp;amp; no-double-decode
# trap, &nbsp;, and a fixed CJK+emoji+combining-mark literal — the
# multibyte UTF-8 proof the r11 verdict asked for), extracts with the
# stdlib-parser Arrow kernel (functions/html.py), and the oracle
# predicts the extracted text DIRECTLY from the raw text without ever
# parsing HTML. Whitespace normalization is pinned to RE2's \s class
# on both sides, so any multibyte corpus content passes byte-for-byte.
# n_chars certifies char-semantics length parity (Spark numChars ==
# DuckDB length == codepoints; the emoji counts 1 on both).
# ---------------------------------------------------------------------------
_S15_MB = "中文 🚀 café"  # CJK + astral emoji + combining mark


@register(
    "s15_html_extract",
    f"""
    WITH x AS (
        SELECT doc_id,
               trim(regexp_replace(replace(
                   'Doc ' || CAST(doc_id AS VARCHAR) ||
                   ' Doc ' || CAST(doc_id AS VARCHAR) ||
                   ' {_S15_MB} ' || COALESCE(text, '') ||
                   ' raw &amp; <b> Hi O end',
                   chr(160), ' '), '[ \\t\\n\\r\\f]+', ' ', 'g')
               ) AS extracted
        FROM documents
    )
    SELECT doc_id, extracted,
           CAST(length(extracted) AS BIGINT) AS n_chars
    FROM x
    """,
    doc="HTML→text extraction (the WET step): script/style/comment "
    "removal, tag stripping, full entity decode, RE2-\\s whitespace "
    "normalization — real HTML built in-query from the corpus, "
    "extracted by the stdlib-parser Arrow kernel, hash-matched "
    "against an oracle that predicts the text without parsing HTML. "
    "Scale shape: one row-local Arrow-batched projection — no "
    "shuffle, embarrassingly parallel.",
)
def s15_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.functions.html import html_to_text

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id").cast("string")
    esc = _escape_html(F.col("text"))
    html = F.concat(
        F.lit("<!DOCTYPE html><html><head><title>Doc "),
        did,
        F.lit(
            '</title><script type="text/javascript">'
            'if (1 < 2) { alert("x&y"); }</script>'
            "<style media=\"all\">p { margin: 0; }</style></head><body>"
            '<!-- boilerplate comment --><h1 class="t">Doc '
        ),
        did,
        F.lit(f'</h1>\n<span lang="zh">{_S15_MB}</span><p data-x="a>b">'),
        esc,
        F.lit(
            "</p><![CDATA[raw]]><div>&amp;amp; &lt;b&gt; &#72;&#105;"
            " &#x4F; &nbsp;end</div></body></html>"
        ),
    )
    return (
        docs.select(
            "doc_id", html_to_text(html).alias("extracted")
        ).select(
            "doc_id",
            "extracted",
            F.length("extracted").cast("bigint").alias("n_chars"),
        )
    )


# ---------------------------------------------------------------------------
# S16 — URL / domain curation (the crawl-side curation stage every
# production pipeline runs between the WARC scan and document
# filtering): normalize + parse host/registered-domain/TLD/path-depth
# (public-suffix rule — broadcast PSL table, r12 verdict directive 3),
# drop blocklisted domains (UT1-style, broadcast LEFT ANTI), cap each
# registered domain's contribution at K docs by salted-md5 rank (the
# C4/Gopher anti-SEO-farm device) via the TWO-PHASE skew-safe cap
# (directive 1a — the oracle below keeps the SINGLE-window spelling,
# which the two-phase plan is row-identical to by construction).
# URLs are derived deterministically from doc_id in-query (the t24
# bucket recipe — the synthetic corpus has no URL column): a skewed
# host mix incl. ccTLD hosts (news.BBC.co.UK → bbc.co.uk;
# example.com.au), PSL private-section hosts whose SUBDOMAINS are the
# registrable unit (u#.blogspot.com, docs.github.io), a host that IS
# a public suffix plus one label (www.gov.uk — does NOT collapse the
# UK), and a blocked spam host spelled with uppercase + userinfo +
# an explicit port ('HTTP://crawler@SPAM-MILL.EXAMPLE:80/…', the
# ADVICE r12 evasion case) — so normalization, the PSL join, the
# anti-join and the cap each discriminate.
# ---------------------------------------------------------------------------
# CAST(... AS STRING): the one spelling BOTH engines parse (Spark has
# no bare VARCHAR; DuckDB aliases STRING to VARCHAR) — this expr runs
# verbatim in the Spark plan AND the DuckDB oracle
_S16_HOST = (
    "CASE WHEN doc_id % 24 < 8 THEN 'en.wikipedia.org' "
    "WHEN doc_id % 24 < 11 THEN "
    "'u' || CAST(doc_id % 7 AS STRING) || '.blogspot.com' "
    "WHEN doc_id % 24 < 13 THEN 'crawler@SPAM-MILL.EXAMPLE:80' "
    "WHEN doc_id % 24 < 15 THEN 'news.BBC.co.UK' "
    "WHEN doc_id % 24 < 16 THEN 'example.com.au' "
    "WHEN doc_id % 24 < 17 THEN 'docs.github.io' "
    "WHEN doc_id % 24 < 18 THEN 'www.gov.uk' "
    # PSL wildcard rule *.ck: nelson.ck is itself a public suffix
    "WHEN doc_id % 24 < 19 THEN 'store.nelson.ck' "
    # PSL exception rule !www.ck (+ case normalization): the one
    # host under *.ck whose registered domain is www.ck itself
    "WHEN doc_id % 24 < 20 THEN 'visit.WWW.CK' "
    # *.kawasaki.jp wildcard (2-label base) …
    "WHEN doc_id % 24 < 21 THEN 'blog.sakura.kawasaki.jp' "
    # … and its !city.kawasaki.jp exception
    "WHEN doc_id % 24 < 22 THEN 'go.city.kawasaki.jp' "
    "ELSE 'arxiv.org' END"
)
_S16_SCHEME = (
    "CASE WHEN doc_id % 24 >= 11 AND doc_id % 24 < 13 "
    "THEN 'HTTP://' ELSE 'https://' END"
)
_S16_URL = (
    f"{_S16_SCHEME} || {_S16_HOST} || '/p/' || "
    "CAST(doc_id AS STRING) "
    "|| CASE WHEN doc_id % 3 = 0 THEN '/a/b' ELSE '' END"
)
_S16_K = 30
_S16_RANK_HASH = "md5(CAST(doc_id AS VARCHAR) || '#s16-v1')"


def _s16_oracle() -> str:
    from garmin_data_pipeline_spark.operators.urls import (
        HOST_PATTERN,
        sql_reg_domain_query,
    )

    path = "regexp_replace(url, '(?i)^https?://[^/]+', '')"
    inner = (
        "SELECT doc_id, url, lower(regexp_extract(url, "
        f"'{HOST_PATTERN}', 1)) AS host FROM u"
    )
    return f"""
    WITH u AS (
        SELECT doc_id, {_S16_URL} AS url FROM documents
    ), p0 AS (
        {sql_reg_domain_query(inner, "doc_id, url")}
    ), p AS (
        SELECT doc_id, host, reg_domain,
               regexp_extract(host, '\\.([a-z0-9-]+)$', 1) AS tld,
               CAST(length({path})
                    - length(replace({path}, '/', ''))
                    AS BIGINT) AS path_depth
        FROM p0
    ), kept AS (
        SELECT *,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY reg_domain
                   ORDER BY {_S16_RANK_HASH}
               ) AS BIGINT) AS domain_rank
        FROM p
        WHERE reg_domain NOT IN ('spam-mill.example')
    )
    SELECT doc_id, host, reg_domain, tld, path_depth, domain_rank
    FROM kept WHERE domain_rank <= {_S16_K}
    """


@register(
    "s16_url_curation",
    _s16_oracle(),
    doc="URL/domain curation: host normalization (lowercase, strip "
    "userinfo/port), registered domains by the FULL publicsuffix."
    "org algorithm — exception rules win, else longest match with "
    "wildcards counting one label past their base (*.ck / !www.ck "
    "included) — via one broadcast LEFT join per rule depth against "
    "the shipped PSL data file, UT1-style blocklist anti-join, and "
    f"the per-domain cap at {_S16_K} docs by salted-md5 rank (the "
    "C4/Gopher anti-domination device) — TWO-PHASE: per (domain, "
    "bucket) pre-cap then exact re-rank of ≤ buckets×k survivors, "
    "so a hot domain sorts on `buckets` tasks, never one. Scale "
    "shape: row-local parses, seven broadcast joins, two bounded "
    "window shuffles.",
)
def s16_url_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.urls import (
        blocklist_filter,
        domain_cap,
        parse_url_columns,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_S16_URL).alias("url")
    )
    parsed = parse_url_columns(docs, "url")
    blocklist = spark.createDataFrame(
        [("spam-mill.example",)], "blocked string"
    )
    kept = blocklist_filter(parsed, "reg_domain", blocklist)
    return domain_cap(kept, "doc_id", "reg_domain", _S16_K).select(
        "doc_id", "host", "reg_domain", "tld", "path_depth",
        "domain_rank",
    )


# ---------------------------------------------------------------------------
# S17 — URL canonicalization + URL-level dedup (r12 verdict directive
# 4): production pipelines collapse re-crawls at the URL level BEFORE
# the expensive extraction stage — lowercase scheme/host, strip
# userinfo / default ports / fragments / tracking params (utm_*,
# fbclid, gclid, …), sort the surviving query params, then keep the
# LATEST fetch per canonical URL (the A3 argmax shape). The fixture
# plants a re-crawl for every doc_id % 4 = 0 under a later fetch_id,
# spelling the same canonical URL with uppercase + userinfo + :443 +
# tracking params + a fragment + shuffled param order, so every
# canonicalization rule discriminates; three base query-string
# classes (real params out of order / tracking-only / none) exercise
# the param filter-sort on the base side too.
# ---------------------------------------------------------------------------
_S17_BASE_URL = (
    "'https://www.Example.ORG/p/' || CAST(doc_id AS STRING) || "
    "CASE WHEN doc_id % 3 = 0 THEN '?b=2&a=1' "
    "WHEN doc_id % 3 = 1 THEN '?utm_campaign=promo' ELSE '' END"
)
_S17_RECRAWL_URL = (
    "'HTTPS://crawler@WWW.EXAMPLE.ORG:443/p/' || "
    "CAST(doc_id AS STRING) || "
    "CASE WHEN doc_id % 3 = 0 THEN '?a=1&fbclid=x&b=2' "
    "WHEN doc_id % 3 = 1 THEN '?gclid=1' "
    "ELSE '?utm_source=rss' END || '#top'"
)


def _s17_oracle() -> str:
    from garmin_data_pipeline_spark.operators.urls import (
        sql_canonicalize_url,
    )

    return f"""
    WITH f AS (
        -- fetch_id = doc_id*2 + class (0 base / 1 re-crawl): the
        -- re-crawl is strictly later per doc and the id spaces stay
        -- disjoint at EVERY scale factor (ADVICE r13 — the former
        -- +1e6 offset aliases real doc ids past 1e6 rows)
        SELECT doc_id * 2 AS fetch_id, {_S17_BASE_URL} AS url
        FROM documents
        UNION ALL
        SELECT doc_id * 2 + 1 AS fetch_id, {_S17_RECRAWL_URL}
        FROM documents WHERE doc_id % 4 = 0
    ), c AS (
        SELECT fetch_id,
               {sql_canonicalize_url("url")} AS canonical_url
        FROM f
    ), r AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY canonical_url
                                  ORDER BY fetch_id DESC) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY canonical_url)
                    AS BIGINT) AS n_fetches
        FROM c
    )
    SELECT canonical_url, fetch_id, n_fetches
    FROM r WHERE rn = 1
    """


@register(
    "s17_url_canonical_dedup",
    _s17_oracle(),
    doc="URL canonicalization + URL-level dedup: lowercase scheme/"
    "host, strip userinfo/default-port/fragment/tracking params, "
    "sort surviving query params, keep the latest fetch per "
    "canonical URL. Runs BEFORE extraction in the crawl front-end "
    "so the dominant kernel never touches a re-crawl. Scale shape: "
    "row-local regex/array expressions + ONE window keyed by "
    "canonical URL (group size = re-fetch count, politeness-bounded "
    "— no domain-cap-style hot key).",
)
def s17_url_canonical_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from garmin_data_pipeline_spark.operators.urls import (
        url_dedup_latest,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    # fetch_id = doc_id*2 + class — scale-safe planted ids (see the
    # oracle's comment; ADVICE r13)
    fetches = docs.select(
        (F.col("doc_id") * 2).alias("fetch_id"),
        F.expr(_S17_BASE_URL).alias("url"),
    ).unionByName(
        docs.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") * 2 + 1).alias("fetch_id"),
            F.expr(_S17_RECRAWL_URL).alias("url"),
        )
    )
    return url_dedup_latest(fetches, "fetch_id", "url").select(
        "canonical_url", "fetch_id", "n_fetches"
    )


# ---------------------------------------------------------------------------
# S18 — main-content / boilerplate block filtering (r12 verdict
# directive 6; CONTEXT-SENSITIVE per r13 directive 1): plain
# tag-stripping (s15) keeps nav/footer/sidebar text it cannot
# distinguish; production WET pipelines (trafilatura / jusText class)
# segment pages into BLOCKS and classify each relationally. The
# kernel (functions/html.py html_blocks_rows) does only the
# segmentation; the POLICY — link density, block length, stopword
# density, and the jusText NEIGHBOR rule (a short block beside good
# content is content; a short island amid boilerplate is boilerplate)
# — is pure column expressions + two page-bounded windows
# (functions/html.py classify_blocks), so it stays relational and
# oracle-certified. The fixture builds a page per doc whose blocks
# exercise every policy arm: a short title then a link-dense <nav>
# (short-next-to-bad → dropped), a short <h1> heading directly
# before the main <p> (short-next-to-GOOD → KEPT — the r13 verdict's
# heading-retention case), the doc text in the <p> (good iff long +
# link-light + stopword-bearing), a long stopword-free keyword <div>
# (the NEW stopword-density discriminator: the old context-free
# policy kept it), a link-dense <aside>, a short cookie-notice <div>
# between two bad blocks (short island → dropped), and a link-dense
# <footer>. The oracle predicts every block row WITHOUT parsing HTML
# (the s15 recipe) and applies the byte-identical policy SQL
# (sql_classify_blocks).
# ---------------------------------------------------------------------------
_S18_MIN_CHARS = H.BLOCK_MIN_CHARS
_S18_NAV = (
    '<nav><a href="/">Home</a><a href="/about">About</a>'
    '<a href="/archive">Archive</a></nav>'
)
_S18_ASIDE = "<aside><a>Ad one here</a> <a>Ad two there</a></aside>"
_S18_FOOTER = (
    "<footer><a>Terms of Use</a> <a>Privacy Policy</a> "
    "<a>Contact Us</a> © Corpus</footer>"
)
# long + link-light + stopword-FREE: boilerplate under the
# context-aware policy (a tag cloud), kept by the old r13 policy
_S18_TAGCLOUD = (
    "<div>spark hadoop flink kafka beam arrow parquet avro "
    "iceberg presto trino druid pinot clickhouse duckdb</div>"
)
# short + link-light, islanded between two bad blocks: dropped by
# the neighbor rule
_S18_COOKIE = "<div>Cookie settings</div>"
# predicted block texts + anchor-char counts (the kernel's pinned
# semantics: anchors concatenate WITHOUT separators)
_S18_NAV_TEXT = "Home About Archive"  # anchors: HomeAboutArchive=16
_S18_ASIDE_TEXT = "Ad one here Ad two there"  # 23 anchor chars
_S18_FOOTER_TEXT = (
    "Terms of Use Privacy Policy Contact Us © Corpus"  # 36 anchor
)
_S18_TAGCLOUD_TEXT = (
    "spark hadoop flink kafka beam arrow parquet avro iceberg "
    "presto trino druid pinot clickhouse duckdb"
)
_S18_COOKIE_TEXT = "Cookie settings"


def _s18_oracle() -> str:
    p_text = (
        "trim(regexp_replace(replace("
        "'Doc ' || CAST(doc_id AS STRING) || ' body ' || "
        "COALESCE(text, ''), chr(160), ' '), "
        "'[ \\t\\n\\r\\f]+', ' ', 'g'))"
    )
    return f"""
    WITH b AS (
        SELECT doc_id, 0 AS block_idx, 'title' AS tag,
               'Boilerplate Fixture' AS text,
               CAST(0 AS BIGINT) AS anchor_chars
        FROM documents
        UNION ALL
        SELECT doc_id, 1, 'nav', '{_S18_NAV_TEXT}', 16
        FROM documents
        UNION ALL
        SELECT doc_id, 2, 'h1',
               'Doc ' || CAST(doc_id AS STRING), 0
        FROM documents
        UNION ALL
        SELECT doc_id, 3, 'p', {p_text}, 0 FROM documents
        UNION ALL
        SELECT doc_id, 4, 'div', '{_S18_TAGCLOUD_TEXT}', 0
        FROM documents
        UNION ALL
        SELECT doc_id, 5, 'aside', '{_S18_ASIDE_TEXT}', 23
        FROM documents
        UNION ALL
        SELECT doc_id, 6, 'div', '{_S18_COOKIE_TEXT}', 0
        FROM documents
        UNION ALL
        SELECT doc_id, 7, 'footer', '{_S18_FOOTER_TEXT}', 36
        FROM documents
    ){H.sql_classify_blocks("doc_id")}
    SELECT doc_id, block_idx, tag, text, n_chars, anchor_chars,
           link_density_ppm, stop_ppm, cls, kept
    FROM clsn
    """


@register(
    "s18_main_content_blocks",
    _s18_oracle(),
    doc="Main-content / boilerplate block filtering (jusText-class, "
    "context-SENSITIVE): segment pages into blocks at block-level "
    "tags (one Arrow mapInPandas pass), then classify relationally "
    "— link density + length + stopword density (exact ppm "
    "integers) and the jusText neighbor rule (short blocks beside "
    "good content are kept: headings survive; short islands amid "
    "boilerplate drop). Scale shape: row-group-local kernel; "
    "scoring is pure column expressions; the neighbor rule is two "
    "windows over page-bounded partitions whose Exchange any "
    "per-doc reassembly downstream reuses.",
)
def s18_main_content_blocks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from garmin_data_pipeline_spark.functions.html import (
        classify_blocks,
        html_blocks_rows,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit(
            "<!DOCTYPE html><html><head><title>Boilerplate Fixture"
            '</title><script>if (1 < 2) { track("&x"); }</script>'
            f"</head><body>{_S18_NAV}<h1>Doc "
        ),
        did,
        F.lit("</h1><p>Doc "),
        did,
        F.lit(" body "),
        _escape_html(F.col("text")),
        F.lit(
            f"</p>{_S18_TAGCLOUD}{_S18_ASIDE}{_S18_COOKIE}"
            f"{_S18_FOOTER}</body></html>"
        ),
    )
    blocks = html_blocks_rows(
        docs.select("doc_id", html.alias("page")), "doc_id", "page"
    )
    return classify_blocks(blocks, "doc_id").select(
        "doc_id",
        "block_idx",
        "tag",
        "text",
        "n_chars",
        "anchor_chars",
        "link_density_ppm",
        "stop_ppm",
        "cls",
        "kept",
    )


# ---------------------------------------------------------------------------
# E2E-CRAWL — the fused crawl front-end (VERDICT r11 directive 2;
# URL-level dedup added per r12 directive 4): WARC scan (s14) → URL
# canonicalization + latest-fetch-per-canonical-URL dedup (s17,
# BEFORE extraction so the dominant kernel never touches a
# superseded re-crawl) → HTML→text extraction (s15) → language ID
# (t2) → Gopher quality verdicts (t19) → exact CONTENT dedup
# annotation (d1) as ONE Catalyst plan — the composition a real
# training-data user actually runs, certified end-to-end, not
# stage-by-stage.
#
# Construction: real per-member-gzip WARC archives are built in-query
# whose HTTP bodies are HTML-wrapped document text (the s15 wrapper
# WITHOUT doc-id-dependent text content, so exact duplicates in the
# corpus stay exact duplicates after extraction and d1 has real
# groups to find). THREE fetch classes make every stage discriminate:
# every doc's base fetch (messy-but-canonicalizable URI); a CONTENT
# mirror for doc_id % 50 = 0 (different site, same text — survives
# URL dedup, collapsed by content dedup); and a URL RE-CRAWL for
# doc_id % 40 = 0 (same canonical URL spelled with uppercase +
# userinfo + :443 + a tracking param + a fragment, fetched a month
# later — URL dedup keeps the LATER fetch and drops the base one, so
# those docs surface with n_fetches = 2 and are never extracted
# twice). Doc identity is recovered from the canonical URL's path;
# fetch recency is the WARC-Date — exactly the production rule
# (latest fetch of a URL wins). The oracle composes the stage oracles
# in one CTE chain: canonicalization + the argmax window, predicted
# extraction (never parses HTML), the t2 langid CASE chain, the t19
# gates as a WHERE, d1's normalized-text hash as a GROUP BY —
# joined back per kept doc.
#
# Scale shape: grouped Arrow encode + Arrow record explode + one
# Arrow extraction projection (all row/group-local, no state), then
# pure column expressions. The dedup annotation is the skew-safe
# shape (r12 verdict directive 1b): a groupBy(text_hash) aggregate —
# map-side partial combine, so a viral page that passes the gates is
# pre-reduced on every map task instead of landing whole on ONE
# window partition — joined back per kept doc (sort-merge under AQE,
# skew-split eligible; at small SF AQE converts it to a broadcast of
# the group relation). The kept relation is lazily localCheckpointed
# first so its two consumers (aggregate + probe) run the extraction
# kernel ONCE — the production move of materializing the extracted
# (id, lang, hash) relation, which is ~50 bytes/row however big the
# HTML was.
# ---------------------------------------------------------------------------
_CRAWL_PREFIX = f"Crawl Result Crawl Result {_S15_MB} "
_CRAWL_SUFFIX = " raw &amp; <b> Hi O end"
# Fetch URIs (cross-engine exprs over doc_id — run verbatim in the
# Spark plan and the DuckDB oracle). Base and re-crawl spell the SAME
# canonical URL two messy ways; the mirror is a different site.
# Planted ids are doc_id*10 + class (base 0 / mirror 1 / re-crawl 2)
# — disjoint-by-residue at EVERY scale factor, unlike the former
# +1e6/+2e6 offsets which alias real doc ids once the corpus passes
# 1e6 rows (ADVICE r13). The same expressions run on both sides.
_E2E_BASE_URI = (
    "'https://Corpus.EXAMPLE/doc/' || CAST(doc_id * 10 AS STRING) "
    "|| '?b=2&a=1'"
)
_E2E_MIRROR_URI = (
    "'https://mirror.example/doc/' || "
    "CAST(doc_id * 10 + 1 AS STRING)"
)
_E2E_RECRAWL_URI = (
    "'HTTPS://crawler@CORPUS.EXAMPLE:443/doc/' || "
    "CAST(doc_id * 10 AS STRING) || '?a=1&utm_source=feed&b=2#top'"
)


def _e2e_latest_cte() -> str:
    """The shared oracle front half (crawl fetch classes →
    canonicalization → latest-fetch dedup) — one source of truth for
    both fused-pipeline oracles, mirroring _e2e_latest_fetches."""
    from garmin_data_pipeline_spark.operators.urls import (
        sql_canonicalize_url,
    )

    return f"""
    WITH crawl AS (
        -- base fetch of every doc, a content MIRROR (different site,
        -- same text) and a URL RE-CRAWL (same canonical URL, fetched
        -- later) — the three duplicate classes a crawl front-end
        -- exists to tell apart (the synthetic corpus has no natural
        -- dups, so all three are planted in-query on BOTH sides)
        SELECT doc_id * 10 AS doc_id, text, {_E2E_BASE_URI} AS uri,
               '2026-01-01T00:00:00Z' AS fetch_date
        FROM documents
        UNION ALL
        SELECT doc_id * 10 + 1 AS doc_id, text, {_E2E_MIRROR_URI},
               '2026-01-01T00:00:00Z'
        FROM documents WHERE doc_id % 50 = 0
        UNION ALL
        SELECT doc_id * 10 AS doc_id, text, {_E2E_RECRAWL_URI},
               '2026-02-01T00:00:00Z'
        FROM documents WHERE doc_id % 40 = 0
    ), canon AS (
        SELECT *, {sql_canonicalize_url("uri")} AS canonical_url
        FROM crawl
    ), latest AS (
        SELECT doc_id, text, n_fetches FROM (
            SELECT *,
                   ROW_NUMBER() OVER (
                       PARTITION BY canonical_url
                       ORDER BY fetch_date DESC) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY canonical_url)
                        AS BIGINT) AS n_fetches
            FROM canon
        ) WHERE rn = 1
    )"""


def _e2e_crawl_oracle() -> str:
    return f"""{_e2e_latest_cte()}, ext AS (
        SELECT doc_id, n_fetches,
               trim(regexp_replace(replace(
                   '{_CRAWL_PREFIX}' || COALESCE(text, '') ||
                   '{_CRAWL_SUFFIX}',
                   chr(160), ' '), '[ \\t\\n\\r\\f]+', ' ', 'g')
               ) AS text
        FROM latest
    ), m AS (
        SELECT doc_id, n_fetches, text, {_TOKS} AS toks FROM ext
    ){_e2e_gate_dedup_cte()}"""


def _e2e_gate_dedup_cte() -> str:
    """The shared oracle back half (gates → lang+hash → dedup groups
    → annotated output), mirroring _gate_and_hash + the skew-safe
    groupBy/join-back — one source of truth for both fused
    oracles. Expects a CTE ``m(doc_id, n_fetches, text, toks)``."""
    return f""", k AS (
        SELECT doc_id, n_fetches,
               {_sql_langid()} AS lang,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS text_hash
        FROM m
        WHERE len(toks) BETWEEN 30 AND 5000
          AND (CASE WHEN len(toks) > 0 THEN
                   CAST(list_sum(list_transform(toks, x -> len(x)))
                       AS BIGINT) / len(toks) ELSE 0.0 END)
              BETWEEN 3.0 AND 10.0
          AND (CASE WHEN len(toks) > 0 THEN
                   {T.sql_stopword_hits("toks", "en")} / len(toks)
                   ELSE 0.0 END) >= 0.05
          AND {_sql_dup_frac(2)} <= 0.4
    ), g AS (
        SELECT text_hash, MIN(doc_id) AS canonical_id,
               COUNT(*) AS n_dups
        FROM k GROUP BY 1
    )
    SELECT k.doc_id, k.n_fetches, k.lang, k.text_hash,
           g.canonical_id, g.n_dups,
           CAST(k.doc_id = g.canonical_id AS INT) AS is_canonical
    FROM k JOIN g USING (text_hash)
    """


@register(
    "e2e_crawl",
    _e2e_crawl_oracle(),
    doc="Fused crawl front-end: WARC ingest → URL canonicalization + "
    "latest-fetch URL dedup (BEFORE extraction, so re-crawls never "
    "reach the dominant kernel) → HTML extraction → language ID → "
    "Gopher quality gates → exact content-dedup annotation in ONE "
    "Catalyst plan, oracle-composed end-to-end. Scale shape: "
    "row/group-local Arrow stages then column expressions; the URL "
    "dedup is one window over canonical URLs (group size = re-fetch "
    "count — politeness-bounded, no hot key); the content-dedup "
    "annotation is the skew-safe groupBy(text_hash) aggregate "
    "(map-side partial combine) joined back per doc (AQE skew-split "
    "eligible) — NOT a per-hash window, so a viral duplicate page "
    "never lands whole on one task. The extracted relation is "
    "checkpointed once so both join sides reuse ONE kernel pass. "
    "The extraction kernel is pinned to a single evaluation (see "
    "functions/html.py).",
)
def e2e_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    kept = (
        _e2e_crawl_kept(spark, sf_dir)
        # one kernel pass feeds BOTH the group aggregate and the
        # probe side (lazy: materializes on first action, reused by
        # the second consumer; bench/serve hygiene releases it).
        # NOTE the checkpoint hides the upstream plan from the outer
        # EXPLAIN — tests assert the upstream shape (single-eval
        # extraction, partitioned URL window) on _e2e_crawl_kept
        # directly.
        .localCheckpoint(eager=False)
    )
    # skew-safe dedup annotation (r12 verdict 1b): partial-aggregating
    # groupBy — the d1 exact_duplicates shape — then join back; never
    # a per-hash window (a hot hash would sort whole on one task)
    groups = kept.groupBy("text_hash").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )
    return kept.join(groups, "text_hash").select(
        "doc_id",
        "n_fetches",
        "lang",
        "text_hash",
        "canonical_id",
        "n_dups",
        (F.col("doc_id") == F.col("canonical_id"))
        .cast("int")
        .alias("is_canonical"),
    )


def _e2e_crawl_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fused front-end UP TO the dedup annotation: fetch classes
    → WARC build/parse → URL canonicalization + latest-fetch dedup →
    single-eval extraction → langID + gates → (doc_id, n_fetches,
    lang, text_hash). Exposed un-checkpointed so plan tests can see
    the upstream shape."""
    from garmin_data_pipeline_spark.functions.html import html_to_text

    html = F.concat(
        F.lit(
            "<!DOCTYPE html><html><head><title>Crawl Result</title>"
            '<script>if (1 < 2) { track("&x"); }</script>'
            "<style>body { margin: 0; }</style></head><body>"
            "<!-- header boilerplate --><h1>Crawl Result</h1>"
            f'<span lang="zh">{_S15_MB}</span><p data-x="a>b">'
        ),
        _escape_html(F.col("text")),
        F.lit(
            "</p><![CDATA[raw]]><div>&amp;amp; &lt;b&gt; &#72;&#105;"
            " &#x4F; &nbsp;end</div></body></html>"
        ),
    )
    latest = _e2e_latest_fetches(spark, sf_dir, html)
    pages = latest.select(
        F.regexp_extract(F.col("canonical_url"), r"doc/(\d+)", 1)
        .cast("bigint")
        .alias("doc_id"),
        "n_fetches",
        html_to_text(_http_body_expr()).alias("text"),
    )
    return _gate_and_hash(pages)


# ---------------------------------------------------------------------------
# E2E-CRAWL-MC — the fused front-end with MAIN-CONTENT extraction
# (s18) in place of plain tag-stripping: the production WET path.
# Same front half as e2e_crawl (three fetch classes → WARC → URL
# canonicalization + latest-fetch dedup) and same back half (gates →
# skew-safe dedup annotation), but the page is wrapped in REAL
# boilerplate (link-dense nav/aside, boilerplate footer, short
# title/h1 — the s18 fixture blocks) and extraction segments it into
# blocks, classifies them relationally (context-SENSITIVE per r13
# directive 1), and reassembles only the kept content. Plain
# s15-style extraction would prepend the SAME nav/footer text to
# every page — here it never reaches the corpus. Under the
# context-aware policy the short <h1> heading directly before a GOOD
# main <p> is now KEPT (the r13 verdict's heading-retention case —
# the reassembled corpus text carries its heading), while the
# title/tagcloud/aside/cookie/footer blocks can never pass (short
# beside bad, stopword-free, or link-dense by construction). So the
# oracle predicts the reassembly as 'Crawl Result ' || p-text,
# present exactly when the p block is good (long + link-light +
# stopword-bearing).
# ---------------------------------------------------------------------------
def _e2e_crawl_mc_oracle() -> str:
    stop_ppm = (
        f"(CAST({T.sql_stopword_hits('toks', 'en')} AS BIGINT) "
        "* 1000000) // greatest(CAST(len(toks) AS BIGINT), 1)"
    )
    return f"""{_e2e_latest_cte()}, ext AS (
        SELECT doc_id, n_fetches,
               trim(regexp_replace(replace(
                   '{_S15_MB} ' || COALESCE(text, ''),
                   chr(160), ' '), '[ \\t\\n\\r\\f]+', ' ', 'g')
               ) AS text
        FROM latest
    ), mc AS (
        -- the main <p> is 'good' iff long + link-light (0 anchors
        -- by construction) + stopword-bearing; its h1 neighbor
        -- ('Crawl Result', short) is kept exactly when the p is
        -- good (nearest decided neighbor), so the reassembled text
        -- is heading + ' ' + p-text — and no other fixture block
        -- can ever be kept (see the s18 fixture analysis)
        SELECT doc_id, n_fetches,
               'Crawl Result ' || text AS text
        FROM (SELECT *, {_TOKS} AS toks FROM ext)
        WHERE length(text) >= {_S18_MIN_CHARS}
          AND {stop_ppm} >= {H.BLOCK_STOP_MIN_PPM}
    ), m AS (
        SELECT doc_id, n_fetches, text, {_TOKS} AS toks FROM mc
    ){_e2e_gate_dedup_cte()}"""


@register(
    "e2e_crawl_mc",
    _e2e_crawl_mc_oracle(),
    doc="Fused crawl front-end with MAIN-CONTENT extraction: WARC "
    "ingest → URL canonicalization + latest-fetch dedup → block "
    "segmentation + jusText keep policy + main-text reassembly (the "
    "s18 stage, replacing plain tag-stripping — boilerplate "
    "nav/aside/footer text never reaches the corpus) → language ID "
    "→ Gopher gates → skew-safe exact-dedup annotation, ONE "
    "Catalyst plan. Scale shape: adds one bounded per-doc aggregate "
    "(≤ 8 block rows/doc reassemble) to e2e_crawl's; everything "
    "else identical.",
)
def e2e_crawl_mc(spark: SparkSession, sf_dir: str) -> DataFrame:
    kept = (
        _e2e_crawl_mc_kept(spark, sf_dir)
        # same single-kernel-pass checkpoint as e2e_crawl
        .localCheckpoint(eager=False)
    )
    groups = kept.groupBy("text_hash").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )
    return kept.join(groups, "text_hash").select(
        "doc_id",
        "n_fetches",
        "lang",
        "text_hash",
        "canonical_id",
        "n_dups",
        (F.col("doc_id") == F.col("canonical_id"))
        .cast("int")
        .alias("is_canonical"),
    )


def _e2e_crawl_mc_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e2e_crawl_mc up to the dedup annotation, un-checkpointed (the
    plan-shape tests look here). The page carries the s18 fixture's
    boilerplate blocks around the doc text; block segmentation +
    the relational context-aware policy + ordered reassembly recover
    ONLY the main content — heading included (r13 directive 1)."""
    from garmin_data_pipeline_spark.functions.html import (
        classify_blocks,
        html_blocks_rows,
    )

    html = F.concat(
        F.lit(
            "<!DOCTYPE html><html><head><title>Boilerplate Fixture"
            '</title><script>if (1 < 2) { track("&x"); }</script>'
            f"</head><body>{_S18_NAV}<h1>Crawl Result</h1>"
            f'<p><span lang="zh">{_S15_MB}</span> '
        ),
        _escape_html(F.col("text")),
        F.lit(
            f"</p>{_S18_TAGCLOUD}{_S18_ASIDE}{_S18_COOKIE}"
            f"{_S18_FOOTER}</body></html>"
        ),
    )
    latest = _e2e_latest_fetches(spark, sf_dir, html)
    pages = latest.select(
        F.regexp_extract(F.col("canonical_url"), r"doc/(\d+)", 1)
        .cast("bigint")
        .alias("doc_id"),
        "n_fetches",
        _http_body_expr().alias("page"),
    )
    # page-level metadata rides the explode as an extras column —
    # no corpus-sized join back to the page relation
    blocks = html_blocks_rows(
        pages, "doc_id", "page", extras={"n_fetches": "bigint"}
    )
    # context-aware classification (s18's policy, shared helper):
    # its windows partition by doc_id — the SAME partitioning the
    # reassembly aggregate below needs, so Catalyst plans ONE
    # Exchange for both (plan-asserted in test_skew_hardening)
    kept_blocks = classify_blocks(blocks, "doc_id").filter(
        F.col("kept") == 1
    )
    # reassemble main content in block order: one BOUNDED per-doc
    # aggregate (≤ 8 block rows per page by fixture construction;
    # ≤ page block count in general — never corpus-shaped)
    main = kept_blocks.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("block_idx", "text"))
                ),
                lambda s: s["text"],
            ),
            " ",
        ).alias("text"),
        F.min("n_fetches").alias("n_fetches"),
    )
    return _gate_and_hash(main)


def _e2e_latest_fetches(
    spark: SparkSession, sf_dir: str, html: "F.Column"
) -> DataFrame:
    """Shared e2e front half: three planted fetch classes → real WARC
    build/parse → URL canonicalization + latest-fetch dedup. Returns
    the survivor records (canonical_url, n_fetches, content …)."""
    from garmin_data_pipeline_spark.operators.urls import (
        url_dedup_latest,
    )

    base = table(spark, sf_dir, "documents").select("doc_id", "text")
    jan = F.lit("2026-01-01T00:00:00Z").alias("date")
    # three planted fetch classes (see the oracle's `crawl` CTE —
    # the corpus has no natural dups). The helper's doc_id column is
    # the UNIQUE fetch key — doc_id*10 + class (0 base / 1 mirror /
    # 2 re-crawl), disjoint by residue at every scale factor (ADVICE
    # r13); doc identity travels in the URI path and is recovered
    # from the canonical URL.
    fetches = (
        base.select(
            (F.col("doc_id") * 10).alias("doc_id"),
            "text",
            F.expr(_E2E_BASE_URI).alias("uri"),
            jan,
        )
        .unionByName(
            base.filter(F.col("doc_id") % 50 == 0).select(
                (F.col("doc_id") * 10 + 1).alias("doc_id"),
                "text",
                F.expr(_E2E_MIRROR_URI).alias("uri"),
                jan,
            )
        )
        .unionByName(
            base.filter(F.col("doc_id") % 40 == 0).select(
                (F.col("doc_id") * 10 + 2).alias("doc_id"),
                "text",
                F.expr(_E2E_RECRAWL_URI).alias("uri"),
                F.lit("2026-02-01T00:00:00Z").alias("date"),
            )
        )
    )
    recs = _warc_fixture_records(
        fetches.select("doc_id", html.alias("body"), "uri", "date"),
        "text/html",
    )
    # URL-level dedup FIRST (latest WARC-Date per canonical URL —
    # ISO-8601 strings sort chronologically), so the extraction
    # kernel downstream never runs on a superseded fetch. WARC-Date
    # has second granularity, so a same-second re-fetch would tie —
    # the content-md5 tiebreaker makes the pick deterministic (ties
    # with identical content are output-identical either way; see
    # url_dedup_latest's reproducibility contract)
    return url_dedup_latest(
        recs.filter(F.col("parse_error").isNull()).select(
            "target_uri",
            "warc_date",
            "content",
            F.md5("content").alias("__content_md5"),
        ),
        "warc_date",
        "target_uri",
        tiebreakers=("__content_md5",),
    )


def _gate_and_hash(pages: DataFrame) -> DataFrame:
    """Shared e2e back half: the t2/t19 gates over extracted text,
    then (doc_id, n_fetches, lang, text_hash) for the dedup stage."""
    from garmin_data_pipeline_spark.operators.dedup_scale import (
        normalize_text,
    )
    from garmin_data_pipeline_spark.operators.text import (
        language_guess,
        shingles,
        stopword_hits,
        tokens,
    )

    text = F.col("text")
    toks = tokens(text)
    n_tokens = F.size(toks)
    # r14 optimization (guide §1.2 step 2): the gate arithmetic is
    # UNCONDITIONAL — the former per-gate F.when(n_tokens > 0, ...)
    # guards put every tokenizer/aggregate subtree inside a CASE
    # branch, which exempts it from whole-stage-codegen subexpression
    # elimination, so tokens(text) re-evaluated once per gate
    # (measured: 29 copies of the tokenizer regex in the executed
    # plan). Unguarded, the shared subtrees are CSE'd to one
    # evaluation per operator. Decision parity is exact: double
    # division never throws (long/int -> double; 0-token rows yield
    # NaN/Infinity which fail every >= gate), and every row the
    # guards used to rescue (n_tokens < 2) already fails the
    # 30..5000 length gate, so the conjunction is unchanged for
    # every input (pinned in tests/test_expr_fastpath.py).
    # try_divide, not "/": ANSI integral division THROWS on a zero
    # divisor; try_divide yields NULL there (same value everywhere
    # else), and a NULL conjunct can never make the filter true —
    # exactly the rows the 30..5000 gate already rejects.
    mwl = F.try_divide(
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ),
        n_tokens,
    )
    swr = F.try_divide(stopword_hits(toks, "en"), n_tokens)
    dup2 = F.round(
        1.0 - F.try_divide(F.size(shingles(text, 2)), n_tokens - 1),
        6,
    )
    keep = (
        n_tokens.between(30, 5000)
        & (mwl >= 3.0)
        & (mwl <= 10.0)
        & (swr >= 0.05)
        & (dup2 <= 0.4)
    )
    return pages.filter(keep).select(
        "doc_id",
        "n_fetches",
        language_guess(text).alias("lang"),
        F.md5(normalize_text(text)).alias("text_hash"),
    )


# ---------------------------------------------------------------------------
# T26 — model-based quality scoring (VERDICT r11 stretch item 8):
# production pipelines distill heuristic signals into a TRAINED
# classifier (CCNet, the GPT-3 WebText filter). The repo ships both
# halves (operators/quality_model.py): pyspark.ml LogisticRegression
# distillation behind the import guard (pytest-pinned by holdout
# agreement with the t19 rule labels — LBFGS coefficients are
# float-path-dependent, so bit-parity is NOT claimed there), and this
# registered row: the deterministic closed-form-weights TWIN (the v9p
# grid-book recipe) — the same engineered features as EXACT ppm
# integers (the t24 `div` discipline) under fixed integer weights, so
# the score is hash-stable cross-engine.
# ---------------------------------------------------------------------------
_T26_SH2 = T.sql_shingles(_TOKS, 2)


@register(
    "t26_quality_linear_score",
    f"""
    WITH t AS (
        SELECT doc_id, text, {_TOKS} AS toks FROM documents
    ), f AS (
        SELECT doc_id,
               len(toks) AS f_tokens,
               CASE WHEN len(toks) > 0 THEN
                   (CAST(list_sum(list_transform(toks, x -> len(x)))
                        AS BIGINT) * 1000000) // len(toks)
                   ELSE 0 END AS f_mwl_ppm,
               CASE WHEN len(toks) > 0 THEN
                   (CAST({T.sql_stopword_hits("toks", "en")} AS BIGINT)
                        * 1000000) // len(toks)
                   ELSE 0 END AS f_stop_ppm,
               CASE WHEN len(toks) > 0 THEN
                   (CAST(len(list_distinct(toks)) AS BIGINT) * 1000000)
                        // len(toks)
                   ELSE 0 END AS f_dist_ppm,
               CASE WHEN len(toks) - 1 > 0 THEN
                   (CAST(len(toks) - 1 - len({_T26_SH2}) AS BIGINT)
                        * 1000000) // (len(toks) - 1)
                   ELSE 0 END AS f_dup2_ppm
        FROM t
    ), s AS (
        SELECT *,
               CAST(6 * f_stop_ppm + 2 * f_dist_ppm - 4 * f_dup2_ppm
                    - 1 * abs(f_mwl_ppm - 4000000) - 1200000
                    AS BIGINT) AS score
        FROM f
    )
    SELECT doc_id, CAST(f_tokens AS BIGINT) AS f_tokens,
           f_mwl_ppm, f_stop_ppm, f_dist_ppm, f_dup2_ppm,
           score, CAST(score >= 0 AS INT) AS keep
    FROM s
    """,
    doc="Model-based quality scoring, deterministic twin: engineered "
    "features as exact ppm integers under fixed linear weights "
    "(hand-distilled from the t19 Gopher gates); keep = score >= 0. "
    "The trained pyspark.ml distillation lives beside it, "
    "pytest-pinned by rule-label agreement. Scale shape: pure "
    "row-local column expressions, zero shuffle, no UDF.",
)
def t26_quality_linear_score(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from garmin_data_pipeline_spark.operators.quality_model import (
        linear_quality_score,
    )

    return linear_quality_score(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    )


# ---------------------------------------------------------------------------
# T26B — the TRAINED quality model, quantized (r12 verdict directive
# 7): t26's fixed weights are a hand distillation; this row scores
# with the FITTED LogisticRegression's coefficients rounded to
# WEIGHT_SCALE integers (operators/quality_model.py TRAINED_WEIGHTS,
# provenance + regeneration recipe in the module) through the same
# exact-integer feature path — the trained model's weights become
# plan constants, closing the "trained path is pytest-only" gap: the
# oracle certifies the trained model's scores hash-exactly, and the
# pytest pin measures quantized-vs-float agreement.
# ---------------------------------------------------------------------------
def _t26b_oracle() -> str:
    from garmin_data_pipeline_spark.operators.quality_model import (
        TRAINED_WEIGHTS as W,
    )

    return f"""
    WITH t AS (
        SELECT doc_id, text, {_TOKS} AS toks FROM documents
    ), f AS (
        SELECT doc_id,
               len(toks) AS f_tokens,
               CASE WHEN len(toks) > 0 THEN
                   (CAST(list_sum(list_transform(toks, x -> len(x)))
                        AS BIGINT) * 1000000) // len(toks)
                   ELSE 0 END AS f_mwl_ppm,
               CASE WHEN len(toks) > 0 THEN
                   (CAST({T.sql_stopword_hits("toks", "en")} AS BIGINT)
                        * 1000000) // len(toks)
                   ELSE 0 END AS f_stop_ppm,
               CASE WHEN len(toks) > 0 THEN
                   (CAST(len(list_distinct(toks)) AS BIGINT) * 1000000)
                        // len(toks)
                   ELSE 0 END AS f_dist_ppm,
               CASE WHEN len(toks) - 1 > 0 THEN
                   (CAST(len(toks) - 1 - len({_T26_SH2}) AS BIGINT)
                        * 1000000) // (len(toks) - 1)
                   ELSE 0 END AS f_dup2_ppm
        FROM t
    ), s AS (
        SELECT *,
               CAST(({W["f_tokens"]}) * f_tokens
                    + ({W["f_mwl_ppm"]}) * f_mwl_ppm
                    + ({W["f_stop_ppm"]}) * f_stop_ppm
                    + ({W["f_dist_ppm"]}) * f_dist_ppm
                    + ({W["f_dup2_ppm"]}) * f_dup2_ppm
                    + ({W["bias"]})
                    AS BIGINT) AS score
        FROM f
    )
    SELECT doc_id, CAST(f_tokens AS BIGINT) AS f_tokens,
           f_mwl_ppm, f_stop_ppm, f_dist_ppm, f_dup2_ppm,
           score, CAST(score >= 0 AS INT) AS keep
    FROM s
    """


@register(
    "t26b_quality_trained_score",
    _t26b_oracle(),
    doc="TRAINED quality model, quantized to exact integers: the "
    "fitted LogisticRegression's coefficients at WEIGHT_SCALE=1e12 "
    "as plan constants over the same exact-ppm feature path — the "
    "trained model is now oracle-hash-certified, not just "
    "pytest-pinned. Scale shape: identical to t26 — pure row-local "
    "column expressions, zero shuffle, no UDF.",
)
def t26b_quality_trained_score(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from garmin_data_pipeline_spark.operators.quality_model import (
        trained_quality_score,
    )

    return trained_quality_score(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    )


# ---------------------------------------------------------------------------
# T28 — model-based language ID (r13 verdict directive 3): the
# stopword-ratio heuristic (t2) distilled into a TRAINED multinomial
# classifier over char-class features — marker grams + Unicode-script
# counts as exact ppm integers — with the fitted coefficients
# quantized to plan constants (the t26b recipe; provenance +
# refit-reproduces pin in operators/langid_model.py). Covers ru
# (Cyrillic) and el (Greek) — non-Latin scripts the heuristic could
# never see. The fixture plants a per-class language snippet (the
# training families, held-out word order) in FRONT of a 120-char
# slice of the English-ish doc text, so every document is
# MIXED-language — the realistic crawl case the mixed training rows
# exist for — and the model must out-vote the English filler. The
# oracle computes the same integer features, dot products and argmax
# CASE chain from the same constants.
# ---------------------------------------------------------------------------
_T28_SNIPPET = (
    "CASE doc_id % 6 "
    "WHEN 0 THEN 'the quick brown fox jumps over the lazy dog "
    "and runs with great speed of thought' "
    "WHEN 1 THEN 'der schnelle braune fuchs springt über den "
    "faulen hund und läuft nicht mit großer übung' "
    "WHEN 2 THEN 'el rápido zorro marrón salta sobre el perro "
    "perezoso y corre con una velocidad que los años' "
    "WHEN 3 THEN 'le renard brun rapide saute par dessus le chien "
    "paresseux et il est une des forêts' "
    "WHEN 4 THEN 'быстрая коричневая лиса прыгает через ленивую "
    "собаку и бежит с большой скоростью' "
    "ELSE 'η γρήγορη καφέ αλεπού πηδάει πάνω από το τεμπέλικο "
    "σκυλί και τρέχει με μεγάλη ταχύτητα' END"
)
_T28_TEXT = (
    f"({_T28_SNIPPET}) || ' ' || "
    "COALESCE(substr(text, 1, 120), '')"
)


def _t28_oracle() -> str:
    from garmin_data_pipeline_spark.operators.langid_model import (
        FEATURE_COLS,
        sql_langid_features,
        sql_langid_model_score,
    )

    return f"""
    WITH t AS (
        SELECT doc_id, {_T28_TEXT} AS text FROM documents
    ), f AS (
        SELECT doc_id, {sql_langid_features("text")} FROM t
    )
    SELECT doc_id, {', '.join(FEATURE_COLS)},
           {sql_langid_model_score()}
    FROM f
    """


@register(
    "t28_langid_model",
    _t28_oracle(),
    doc="TRAINED language-ID model: multinomial LogisticRegression "
    "over char-class features (marker grams + Cyrillic/Greek script "
    "counts, exact ppm integers), coefficients quantized to integer "
    "plan constants (the t26b recipe, refit-provenance pinned) — "
    "covering non-Latin scripts the stopword heuristic cannot. "
    "Scored on mixed-language fixtures (planted snippet + English "
    "filler). Scale shape: pure row-local regexp-count projections, "
    "zero shuffle, zero UDF, weights are plan constants.",
)
def t28_langid_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.langid_model import (
        langid_model_score,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_T28_TEXT).alias("text")
    )
    return langid_model_score(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# T25 — iterative BPE trainer + encoder (VERDICT r11 directive 4):
# t18 computes ONE merge step; t25 loops it K times into a trained
# vocabulary and then encodes every document under it — the full
# Sennrich-et-al corpus-BPE recipe as relational algebra
# (operators/bpe.py). The oracle UNROLLS the same K iterations as
# chained CTEs (the g1 recipe): pair counts are exact integers, the
# argmax tie-break is total (count DESC, pair ASC), and merge
# application is plain `replace` over a token-boundary string
# encoding (`|l||r|` can only match whole adjacent symbols; both
# engines' replace is left-to-right non-overlapping — exactly BPE's
# greedy-left order), so every intermediate state is bit-stable
# cross-engine. The encoded doc state + exact token count certify the
# TRAINER transitively: one wrong merge changes every encoding.
# ---------------------------------------------------------------------------
_T25_K = 8


def _t25_oracle(k: int) -> str:
    init = (
        "'|' || array_to_string(regexp_extract_all({w}, '[a-z]'), '||')"
        " || '|'"
    )
    apply = (
        "CASE WHEN m.l IS NULL THEN state ELSE replace(state, "
        "'|' || m.l || '||' || m.r || '|', "
        "'|' || m.l || m.r || '|') END AS state"
    )
    parts = [
        "w AS (SELECT word, COUNT(*) AS cnt FROM (SELECT UNNEST("
        "regexp_extract_all(lower(COALESCE(text, '')), '[a-z]+')) AS "
        "word FROM documents) GROUP BY word)",
        f"s0 AS (SELECT word, cnt, {init.format(w='word')} AS state "
        "FROM w)",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"p{i} AS (SELECT l, r, SUM(cnt) AS c FROM (SELECT cnt, "
            "UNNEST(list_slice(toks, 1, len(toks) - 1)) AS l, "
            "UNNEST(list_slice(toks, 2, len(toks))) AS r FROM ("
            "SELECT cnt, string_split(substr(state, 2, "
            f"length(state) - 2), '||') AS toks FROM s{i - 1})) "
            "GROUP BY l, r)"
        )
        parts.append(
            f"m{i} AS (SELECT l, r FROM p{i} "
            "ORDER BY c DESC, l, r LIMIT 1)"
        )
        parts.append(
            f"s{i} AS (SELECT word, cnt, {apply} "
            f"FROM s{i - 1} LEFT JOIN m{i} m ON TRUE)"
        )
    parts.append(
        # COALESCE: DuckDB's array_to_string([]) is NULL, Spark's
        # array_join([]) is '' — a zero-word doc must encode as ''
        "e0 AS (SELECT doc_id, COALESCE(array_to_string("
        "list_transform("
        "regexp_extract_all(lower(COALESCE(text, '')), '[a-z]+'), "
        f"w -> {init.format(w='w')}), '#'), '') AS state "
        "FROM documents)"
    )
    for i in range(1, k + 1):
        parts.append(
            f"e{i} AS (SELECT doc_id, {apply} "
            f"FROM e{i - 1} LEFT JOIN m{i} m ON TRUE)"
        )
    # token-id emission (merge-order vocab): merge i -> id 25+i via
    # its 1-row CTE, chars a..z -> 0..25 as nested static replaces
    parts.append(f"i0 AS (SELECT doc_id, state, state AS ids FROM e{k})")
    for i in range(1, k + 1):
        parts.append(
            f"i{i} AS (SELECT doc_id, state, CASE WHEN m.l IS NULL "
            "THEN ids ELSE replace(ids, "
            f"'|' || m.l || m.r || '|', '|{25 + i}|') END AS ids "
            f"FROM i{i - 1} LEFT JOIN m{i} m ON TRUE)"
        )
    ids_expr = "ids"
    for ci, c in enumerate("abcdefghijklmnopqrstuvwxyz"):
        ids_expr = f"replace({ids_expr}, '|{c}|', '|{ci}|')"
    return (
        "WITH " + ",\n".join(parts)
        + f",\nix AS (SELECT doc_id, state, {ids_expr} AS idn "
        f"FROM i{k})"
        + "\nSELECT doc_id, CAST((length(state) - "
        "length(replace(state, '|', ''))) // 2 AS BIGINT) AS n_tokens,"
        " state, CASE WHEN length(idn) >= 2 THEN "
        "replace(replace(substr(idn, 2, length(idn) - 2), "
        "'||', ','), '|#|', ';') ELSE '' END AS token_ids FROM ix"
    )


@register(
    "t25_bpe_train_encode",
    _t25_oracle(_T25_K),
    doc=f"Iterative BPE: train {_T25_K} merges on word counts, encode "
    "every doc under the trained vocab (exact token count + full "
    "tokenized state). Scale shape: ONE corpus aggregate (word "
    "counts); each training round touches only the vocabulary-sized "
    "distinct-word relation and broadcasts a 1-row argmax; the "
    "encoder is K 1-row broadcasts + row-local replaces, zero "
    "shuffles. Oracle: the K rounds unrolled as CTEs (exact-integer "
    "counts, total tie-break, shared replace semantics).",
)
def t25_bpe_train_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
    )

    docs = table(spark, sf_dir, "documents")
    merges, _states = bpe_train(docs, "text", _T25_K)
    return bpe_encode(
        docs.select("doc_id", "text"), "doc_id", "text", merges
    )


# ---------------------------------------------------------------------------
# T24 — temperature-based source mixture (the multinomial data-mixing
# recipe of XLM-R / LLaMA): source with corpus share p is sampled with
# probability ∝ p^0.5, so tail sources up-sample (epochs > 1 via
# repetition) and dominant sources down-sample (salted-hash Bernoulli
# on the fractional rate). The testdata's `source` column is uniform
# (degenerate: every rate would be exactly 1.0), so the query derives
# a skewed 60/30/10 bucket from doc_id — both the repeat path
# (bucket 'code': r ≈ 1.9 ⇒ 1-2 copies each) and the subsample path
# (bucket 'web': r ≈ 0.78) are exercised and hash-checked. All
# arithmetic is exact integers: floor(sqrt(c)·1e6) (IEEE sqrt is
# exactly rounded), rational rate via DECIMAL(38,0) `div` (probed
# bit-equal to DuckDB HUGEINT `//`), salted md5 hash for the
# Bernoulli — no float accumulation anywhere.
# ---------------------------------------------------------------------------
_T24_BUCKET = (
    "CASE WHEN doc_id % 10 < 6 THEN 'web' "
    "WHEN doc_id % 10 < 9 THEN 'books' ELSE 'code' END"
)
_T24_HASH = sql_base_hash32("CAST(doc_id AS VARCHAR) || '#mix-v1'")


@register(
    "t24_temperature_mix",
    f"""
    WITH d AS (
        SELECT doc_id, {_T24_BUCKET} AS bucket FROM documents
    ), stats AS (
        SELECT bucket, COUNT(*) AS c FROM d GROUP BY bucket
    ), s2 AS (
        SELECT bucket, c,
               CAST(FLOOR(SQRT(c::DOUBLE) * 1000000) AS HUGEINT) AS s_int
        FROM stats
    ), tot AS (
        SELECT SUM(c) AS total, SUM(s_int) AS denom FROM s2
    ), rates AS (
        SELECT bucket,
               (s_int * total * 1000000) // (denom * c::HUGEINT) AS r_ppm
        FROM s2, tot
    ), mixed AS (
        SELECT d.doc_id, d.bucket, r.r_ppm,
               {_T24_HASH} % 1000000 AS h
        FROM d JOIN rates r USING (bucket)
    )
    SELECT doc_id, bucket,
           CAST(copy_idx AS BIGINT) AS copy_idx
    FROM mixed,
         LATERAL (
            SELECT unnest(range(1, CAST(
                1 + r_ppm // 1000000
                  + CASE WHEN h < r_ppm % 1000000 THEN 1 ELSE 0 END
                AS BIGINT)
            )) AS copy_idx
         )
    """,
    doc="Temperature-based (alpha=0.5) source mixture: per-source "
    "rates from exact integer arithmetic, deterministic repetition "
    "for tail sources and salted-hash subsampling for dominant ones. "
    "Scale shape: one count aggregate, a 1-row broadcast "
    "(total/denominator), a #sources-row broadcast join, one explode "
    "— no shuffle beyond the count's partials.",
)
def t24_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.sampling import (
        temperature_mixture,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_T24_BUCKET).alias("bucket")
    )
    out = temperature_mixture(docs, "doc_id", "bucket", alpha=0.5)
    return out.select("doc_id", "bucket", "copy_idx")


# ---------------------------------------------------------------------------
# T6 — sequence packing: assign docs (ordered by id) to fixed
# token-budget bins for context-window packing.
# ---------------------------------------------------------------------------
@register(
    "t6_sequence_packing",
    f"""
    WITH t AS (
        SELECT doc_id, len({_TOKS}) AS n_tokens FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(floor(COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) / 2048) AS BIGINT) AS bin_id
    FROM t
    """,
    doc="Token-budget bin assignment via ordered cumulative sum.",
)
def t6_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.sampling import (
        pack_sequences_sharded,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", T.token_count(F.col("text")).alias("n_tokens")
    )
    # Single-valued shard key: bit-identical to the global
    # cumulative-sum semantics the oracle mirrors (one shard -> offset
    # 0, local bin == global bin), but expressed through the sharded
    # packer so the window carries a partition spec — no registered
    # plan contains an unpartitioned corpus-sized window (plan-
    # invariant test). pmod(doc_id, 1) rather than lit(0) because
    # Catalyst folds literal partition keys out of the window spec.
    # t6's global-order semantics still funnel one partition; users
    # who can tolerate per-shard packing use t6b, which parallelizes.
    return pack_sequences_sharded(
        docs.withColumn("__shard0", F.pmod(F.col("doc_id"), F.lit(1))),
        "n_tokens",
        2048,
        "__shard0",
        ["doc_id"],
    ).drop("__shard0")


# ---------------------------------------------------------------------------
# T6b — SHARDED sequence packing: the 100 TB registered form. Each
# shard (pmod(doc_id, 64)) packs independently under a partitioned
# window; a #shards-row prefix-sum offset makes bin ids globally
# unique. Same bin semantics as t6 within a shard; the only deviation
# is that each shard's last bin may run short. The oracle mirrors the
# two-level plan exactly (per-shard windowed cumsum + offset CTE).
# ---------------------------------------------------------------------------
@register(
    "t6b_sequence_packing_sharded",
    f"""
    WITH t AS (
        SELECT doc_id, len({_TOKS}) AS n_tokens, doc_id % 64 AS shard
        FROM documents
    ), local AS (
        SELECT doc_id, n_tokens, shard,
               CAST(floor(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / 2048) AS BIGINT) AS local_bin
        FROM t
    ), counts AS (
        SELECT shard, MAX(local_bin) + 1 AS n_bins
        FROM local GROUP BY shard
    ), offsets AS (
        SELECT shard, CAST(COALESCE(SUM(n_bins) OVER (
            ORDER BY shard ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ), 0) AS BIGINT) AS off
        FROM counts
    )
    SELECT l.doc_id, l.n_tokens, l.shard,
           CAST(l.local_bin + o.off AS BIGINT) AS bin_id
    FROM local l JOIN offsets o USING (shard)
    """,
    doc="Sharded token-budget packing: partitioned windows + global "
    "bin-id offsets (the scale-safe form of t6).",
)
def t6b_sequence_packing_sharded(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from garmin_data_pipeline_spark.operators.sampling import (
        pack_sequences_sharded,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        F.pmod(F.col("doc_id"), F.lit(64)).alias("shard"),
    )
    return pack_sequences_sharded(
        docs, "n_tokens", 2048, "shard", ["doc_id"]
    )


# ---------------------------------------------------------------------------
# T7 — BPE-ish token counting: GPT-2-style pre-tokenizer matches as the
# LLM-budget proxy (digits/punctuation count separately from words).
# The pattern is RE2/java.util.regex-portable -> exact oracle parity.
# ---------------------------------------------------------------------------
@register(
    "t7_bpe_token_count",
    """
    SELECT doc_id,
           len(regexp_extract_all(text,
               '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'
           )) AS bpe_tokens,
           len(regexp_extract_all(text, ' ?\\p{L}+')) AS word_tokens
    FROM documents
    """,
    doc="GPT-2-pattern pre-token count vs plain word count.",
)
def t7_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(r" ?\p{L}+"), 0)
        ).alias("word_tokens"),
    )


# ---------------------------------------------------------------------------
# T10 — the composed corpus-cleaning pipeline, end to end as ONE plan:
# quality filter -> exact dedup (keep canonical) -> deterministic
# train/test split. This is the user story of the engine: each stage
# is an operator already verified in isolation (t1, d1, t5); composing
# them stays a single declarative DAG — one scan, one hash-agg for the
# dedup, one residue filter, no materialization between stages. Near-
# dup removal (d2/d3) plugs in between dedup and split the same way.
# ---------------------------------------------------------------------------
@register(
    "t10_clean_corpus",
    f"""
    WITH t AS (
        SELECT doc_id, text, {_TOKS} AS toks FROM documents
    ), feat AS (
        SELECT doc_id, text,
               len(toks) AS n_tokens,
               CASE WHEN len(toks) > 0 THEN
                   len(list_distinct(toks)) / len(toks)
                   ELSE 0.0 END AS distinct_ratio
        FROM t
    ), keep AS (
        SELECT * FROM feat
        WHERE n_tokens BETWEEN 25 AND 90 AND distinct_ratio >= 0.35
    ), canon AS (
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS h,
               MIN(doc_id) AS doc_id
        FROM keep GROUP BY 1
    )
    SELECT k.doc_id, k.n_tokens,
           CASE WHEN k.doc_id % 100 < 10 THEN 'test' ELSE 'train' END
               AS split
    FROM keep k JOIN canon USING (doc_id)
    """,
    doc="Composed cleaning pipeline: quality filter -> exact dedup -> "
    "deterministic split, one declarative DAG.",
)
def t10_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    feat = T.quality_features(docs, "text")
    keep = feat.filter(
        (F.col("n_tokens") >= 25)
        & (F.col("n_tokens") <= 90)
        & (F.col("distinct_ratio") >= 0.35)
    )
    canon = exact_duplicates(keep, "doc_id", "text").select(
        F.col("canonical_id").alias("doc_id")
    )
    deduped = keep.join(canon, "doc_id")
    return deduped.select(
        "doc_id",
        "n_tokens",
        F.when(F.pmod(F.col("doc_id"), F.lit(100)) < 10, "test")
        .otherwise("train")
        .alias("split"),
    )


@register(
    "t11_document_chunking",
    T.sql_chunk_documents(chunk_tokens=32, overlap=8),
    doc="Overlapping token-window chunking (32-token chunks, 8-token "
    "overlap): the context-length preprocessing step of a training "
    "pipeline. Narrow plan — tokenize/explode/slice are row-local "
    "array ops, zero shuffles at any corpus size.",
)
def t11_document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return T.chunk_documents(docs, chunk_tokens=32, overlap=8)


def _t12_oracle() -> str:
    counts, red = T.sql_redact_pii("text")
    projections = ",\n           ".join(counts + [red])
    return f"""
    WITH t AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com tel '
                    || printf('555-%03d-%04d', doc_id % 1000,
                              (doc_id * 7) % 10000)
                    || CASE WHEN doc_id % 3 = 0
                            THEN printf(' ssn %03d-%02d-%04d',
                                        doc_id % 1000, doc_id % 100,
                                        doc_id % 10000)
                            ELSE '' END AS text
        FROM documents
    )
    SELECT doc_id,
           {projections}
    FROM t
    """


@register(
    "t12_pii_redaction",
    _t12_oracle(),
    doc="PII scrub pass: per-category match counts + placeholder "
    "redaction over the shared Java-regex/RE2 pattern table. The "
    "synthetic corpus carries no PII, so the plan deterministically "
    "plants an email/phone/(every-3rd-doc) SSN per document — both "
    "engines construct and then redact the identical text. Pure "
    "regexp Column ops: zero shuffles at any scale.",
)
def t12_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com tel "),
            F.format_string(
                "555-%03d-%04d",
                F.pmod(F.col("doc_id"), F.lit(1000)),
                F.pmod(F.col("doc_id") * 7, F.lit(10000)),
            ),
            F.when(
                F.pmod(F.col("doc_id"), F.lit(3)) == 0,
                F.format_string(
                    " ssn %03d-%02d-%04d",
                    F.pmod(F.col("doc_id"), F.lit(1000)),
                    F.pmod(F.col("doc_id"), F.lit(100)),
                    F.pmod(F.col("doc_id"), F.lit(10000)),
                ),
            ).otherwise(F.lit("")),
        ),
    )
    return T.redact_pii(planted, "text").select(
        "doc_id", "n_email", "n_phone", "n_ssn", "redacted"
    )


@register(
    "t8_rolling_fingerprint",
    None,  # xxhash64-based polynomial -> not reproducible in DuckDB
    doc="Order-sensitive rolling-hash document fingerprint.",
)
def t8_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.rolling_fingerprint(F.col("text")).alias("rolling_fp"),
        T.fingerprint(F.col("text")).alias("bag_fp"),
    )


@register(
    "t8p_rolling_fingerprint",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CASE WHEN toks IS NULL THEN NULL ELSE
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(toks,
                           t -> {sql_base_hash32("t")})),
                   (acc, h) -> (acc * {T.ROLL_B} + h) % {T.ROLL_P})
           END AS rolling_fp,
           md5(COALESCE(
               array_to_string(list_sort(list_distinct(toks)), ' '), ''
           )) AS bag_fp
    FROM t
    """,
    doc="t8 under the md5-derived parity hash: same Rabin-Karp "
    "polynomial fold, hash-matched via DuckDB list_reduce (production "
    "t8 keeps xxhash64).",
)
def t8p_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.rolling_fingerprint(F.col("text"), hash_impl="md5").alias(
            "rolling_fp"
        ),
        T.fingerprint(F.col("text")).alias("bag_fp"),
    )


# ---------------------------------------------------------------------------
# T9 — corpus trimming: keep documents whose token count lies between
# the corpus p25 and p99 (the outlier-trimming filter of a pretraining
# pipeline). Plan shape: scalar aggregate broadcast into the filter —
# two passes over the corpus, no shuffle beyond the 1-row aggregate.
# ---------------------------------------------------------------------------
@register(
    "t9_length_trim",
    f"""
    WITH t AS (
        SELECT doc_id, len({_TOKS}) AS n_tokens FROM documents
    ), q AS (
        SELECT quantile_cont(n_tokens, 0.25) AS lo,
               quantile_cont(n_tokens, 0.99) AS hi
        FROM t
    )
    SELECT doc_id, n_tokens
    FROM t, q
    WHERE n_tokens >= lo AND n_tokens <= hi
    """,
    doc="Trim corpus to [p25, p99] token-count band (outlier filter).",
)
def t9_length_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", T.token_count(F.col("text")).alias("n_tokens")
    )
    bounds = docs.agg(
        F.percentile(F.col("n_tokens"), F.lit(0.25)).alias("lo"),
        F.percentile(F.col("n_tokens"), F.lit(0.99)).alias("hi"),
    )
    return (
        docs.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("n_tokens") >= F.col("lo"))
            & (F.col("n_tokens") <= F.col("hi"))
        )
        .select("doc_id", "n_tokens")
    )


# ---------------------------------------------------------------------------
# V6 — SemDeDup-style semantic deduplication (Abbas et al. 2023):
# grid-cell clustering + within-cell cosine pruning, min-id member
# survives. The scale path of embedding dedup — the cells bound the
# candidate self-join exactly like LSH bands bound d3's.
# ---------------------------------------------------------------------------
_SEMDEDUP_TAU = 0.3


@register(
    "v6_semantic_dedup",
    f"""
    WITH c AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), cent(cell, cv) AS (
        VALUES {_cent_values_sql(_GRID)}
    ), assigned AS (
        SELECT vec_id, v, cell FROM (
            SELECT vec_id, v, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id
                       ORDER BY COALESCE(list_dot_product(v, cv), -1e300)
                                DESC, cell
                   ) AS arank
            FROM c CROSS JOIN cent
        ) WHERE arank = 1
    ), losers AS (
        SELECT DISTINCT b.vec_id
        FROM assigned a JOIN assigned b
            ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) /
              NULLIF(sqrt(list_dot_product(a.v, a.v)) *
                     sqrt(list_dot_product(b.v, b.v)), 0)
              >= {_SEMDEDUP_TAU}
    )
    SELECT s.vec_id, CAST(s.cell AS INT) AS cell
    FROM assigned s LEFT JOIN losers l ON s.vec_id = l.vec_id
    WHERE l.vec_id IS NULL
    """,
    doc="SemDeDup-style semantic dedup: coarse-cluster embeddings "
    "against the fixed grid codebook, drop every vector with a "
    "smaller-id cluster-mate at cosine >= 0.3, keep the min-id "
    "representative (drops 182/500 at sf0.01). Cell-bucketed "
    "self-join — candidate pairs bounded by sum(|cell|^2), never "
    "all-pairs; the KMeans-codebook variant is the paper's exact "
    "recipe (swap in build_ivf_index centroids).",
)
def v6_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.similarity import (
        semantic_dedup,
    )

    return semantic_dedup(
        table(spark, sf_dir, "embeddings"),
        _GRID,
        threshold=_SEMDEDUP_TAU,
    )


_V6P_SIDE = 8  # 8 x 8 = 64 effective product cells


def _v6p_oracle() -> str:
    from garmin_data_pipeline_spark.operators.similarity import (
        grid_centroids,
    )

    books_a = grid_centroids(_V6P_SIDE, 64, salt=1)
    books_b = grid_centroids(_V6P_SIDE, 64, salt=2)
    return f"""
    WITH c AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), ca(cell, cv) AS (
        VALUES {_cent_values_sql(books_a)}
    ), cb(cell, cv) AS (
        VALUES {_cent_values_sql(books_b)}
    ), aa AS (
        SELECT vec_id, v, cell FROM (
            SELECT vec_id, v, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id
                       ORDER BY COALESCE(list_dot_product(v, cv), -1e300)
                                DESC, cell
                   ) AS arank
            FROM c CROSS JOIN ca
        ) WHERE arank = 1
    ), ab AS (
        SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id
                       ORDER BY COALESCE(list_dot_product(v, cv), -1e300)
                                DESC, cell
                   ) AS arank
            FROM c CROSS JOIN cb
        ) WHERE arank = 1
    ), assigned AS (
        SELECT aa.vec_id, aa.v,
               aa.cell * {_V6P_SIDE} + ab.cell AS cell
        FROM aa JOIN ab ON aa.vec_id = ab.vec_id
    ), losers AS (
        SELECT DISTINCT b.vec_id
        FROM assigned a JOIN assigned b
            ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) /
              NULLIF(sqrt(list_dot_product(a.v, a.v)) *
                     sqrt(list_dot_product(b.v, b.v)), 0)
              >= {_SEMDEDUP_TAU}
    )
    SELECT s.vec_id, CAST(s.cell AS INT) AS cell
    FROM assigned s LEFT JOIN losers l ON s.vec_id = l.vec_id
    WHERE l.vec_id IS NULL
    """


@register(
    "v6p_semantic_dedup_product",
    _v6p_oracle(),
    doc="v6 through the PRODUCT cell assignment — the oracle-"
    "certified twin of the operator v6s runs at scale: two "
    "independent 8-centroid codebooks, a vector's cell is the PAIR "
    "of per-codebook max-dot argmaxes (8 x 8 = 64 effective cells "
    "for 16 dots/vector — the inverted-multi-index trick that took "
    "the sf1.0 probe's v6s ratio from ~15x to 2.4x), then the "
    "identical within-cell cosine pruning. Certifies "
    "assign_cells_product end to end: both argmax picks, the "
    "cell-id packing arithmetic, and the dedup downstream, "
    "hash-matched against a dual-codebook DuckDB mirror.",
)
def v6p_semantic_dedup_product(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from garmin_data_pipeline_spark.operators.similarity import (
        _semantic_dedup_assigned,
        assign_cells_product,
        grid_centroids,
    )

    assigned = assign_cells_product(
        table(spark, sf_dir, "embeddings"),
        grid_centroids(_V6P_SIDE, 64, salt=1),
        grid_centroids(_V6P_SIDE, 64, salt=2),
    )
    return _semantic_dedup_assigned(assigned, _SEMDEDUP_TAU)


def v6s_semantic_dedup_scaled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bench/probe-only: SemDeDup through the SCALE path —
    corpus-sized codebook (constant cell occupancy => linear pair
    count) instead of the registered v6's fixed 8-cell oracle shape.
    The r8 sf1.0 probe measured the fixed codebook at 17x wall for
    10x data (quadratic pairs); this variant is what a 100 TB run
    calls (sf1_probe.json carries both ratios). Not oracle-registered:
    the cell count depends on a runtime COUNT, which a static SQL
    string cannot mirror — the dedup logic itself is certified by v6."""
    from garmin_data_pipeline_spark.operators.similarity import (
        semantic_dedup_scaled,
    )

    return semantic_dedup_scaled(
        table(spark, sf_dir, "embeddings"),
        threshold=_SEMDEDUP_TAU,
        target_cell_size=64,
    )


# ---------------------------------------------------------------------------
# T16 — per-language vocabulary top-k: the grouped variant of t15
# (multilingual tokenizer training allocates vocab per language).
# Window ranks run on the AGGREGATED (lang, token) counts — tiny next
# to the corpus — and the window is partitioned by lang, so no global
# sort and no single-reducer rank at any scale.
# ---------------------------------------------------------------------------
@register(
    "t16_vocab_topk_per_lang",
    f"""
    WITH tok AS (
        SELECT lang, UNNEST({_TOKS}) AS token FROM documents
    ), counts AS (
        SELECT lang, token, COUNT(*) AS cnt
        FROM tok GROUP BY lang, token
    )
    SELECT lang, token, cnt, CAST(rnk AS INT) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY lang ORDER BY cnt DESC, token
        ) AS rnk FROM counts
    ) WHERE rnk <= 10
    """,
    doc="Per-language vocabulary top-10 by token frequency: explode "
    "+ map-side-partial hash aggregate, then a lang-partitioned "
    "row_number over the (small) aggregated counts — per-group top-k "
    "without a global sort.",
)
def t16_vocab_topk_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    counts = (
        table(spark, sf_dir, "documents")
        .select(
            "lang", F.explode(T.tokens(F.col("text"))).alias("token")
        )
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("cnt"), F.col("token")
    )
    return counts.withColumn(
        "rnk", F.row_number().over(w).cast("int")
    ).filter(F.col("rnk") <= 10)


# ---------------------------------------------------------------------------
# T17 — TF-IDF doc-term matrix. The full matrix (not a top-k pick) so
# the row set is float-ordering-insensitive: selection by a float rank
# could flip on a 1-ulp ln() difference between engines, a cell value
# rounded to 6 dp cannot.
# ---------------------------------------------------------------------------
@register(
    "t17_tfidf_matrix",
    f"""
    WITH tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM (SELECT doc_id, UNNEST({_TOKS}) AS token FROM documents)
        GROUP BY doc_id, token
    ), dfreq AS (
        SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
           ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6)
               AS tfidf
    FROM tf JOIN dfreq USING (token) CROSS JOIN n
    """,
    doc="TF-IDF doc-term matrix: explode + two partial-agg counts + "
    "token-keyed join (AQE broadcast at small vocab, skew-split "
    "shuffle at 100 TB vocab) + broadcast 1-row corpus count.",
)
def t17_tfidf_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.tfidf_matrix(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# T18 — BPE merge-step pair counts (tokenizer training prep: the
# distributed inner loop of byte-pair-encoding).
# ---------------------------------------------------------------------------
@register(
    "t18_bpe_pairs",
    f"""
    WITH tok AS (
        SELECT UNNEST({_TOKS}) AS token FROM documents
    ), pairs AS (
        SELECT UNNEST(list_transform(
            generate_series(1, len(token) - 1),
            i -> substr(token, i, 2))) AS pair
        FROM tok WHERE len(token) >= 2
    )
    SELECT pair, COUNT(*) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair
    LIMIT 20
    """,
    doc="BPE-training merge step: adjacent character-pair counts over "
    "all token instances, top-20 via TakeOrderedAndProject (no global "
    "sort); all-integer output.",
)
def t18_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.bpe_pair_counts(table(spark, sf_dir, "documents"), k=20)


# ---------------------------------------------------------------------------
# V7 — per-label embedding centroids (class prototypes; the M-step of
# a distributed KMeans expressed as one relational aggregate).
# ---------------------------------------------------------------------------
@register(
    "v7_label_centroids",
    """
    WITH ex AS (
        -- parallel UNNESTs zip element-wise in DuckDB: 0-based pos
        -- matches Spark's posexplode ordinal
        SELECT label,
               UNNEST(generate_series(0, len(embedding) - 1)) AS pos,
               UNNEST(embedding) AS v
        FROM embeddings
    )
    SELECT label, CAST(pos AS INT) AS pos,
           CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(v) AS mean_val,
           COUNT(v) AS n
    FROM ex GROUP BY label, pos
    """,
    doc="Per-label embedding centroids in long format: posexplode -> "
    "hash aggregate on (label, pos) with map-side DECIMAL partials — "
    "one shuffle of labels x dim partial sums, never raw vectors.",
)
def v7_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.similarity import (
        embedding_centroids,
    )

    return embedding_centroids(table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# G1 — fixed-iteration PageRank over the bipartite user -> event_type
# interaction graph (operators/graph.py pagerank). The oracle UNROLLS
# the same 5 iterations as chained CTEs — possible because the
# operator's determinism contract (DECIMAL(28,12) contribution sums,
# fixed rounds, identical double expression structure) makes the
# result bit-stable across engines. This certifies an ITERATIVE
# algorithm against SQL, like d5's recursive-CTE components oracle.
# ---------------------------------------------------------------------------
_G1_ITER = 5
_G1_DAMP = 0.85


def _g1_oracle() -> str:
    head = """
    WITH e AS (
        SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS src,
                        't' || event_type AS dst
        FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ), nodes AS (
        SELECT src AS node FROM e UNION SELECT dst FROM e
    ), nn AS (SELECT COUNT(*) AS n FROM nodes),
    outdeg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
    r0 AS (
        SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
        FROM nodes
    )"""
    steps = []
    for k in range(_G1_ITER):
        steps.append(f"""
    , inflow{k} AS (
        SELECT e.dst,
               CAST(SUM(CAST(r{k}.rank / outdeg.outdeg
                   AS DECIMAL(28,12))) AS DOUBLE) AS inflow
        FROM e
        JOIN r{k} ON e.src = r{k}.node
        JOIN outdeg ON e.src = outdeg.src
        GROUP BY e.dst
    ), r{k + 1} AS (
        SELECT nodes.node,
               (CAST(1.0 AS DOUBLE) - {_G1_DAMP}) / (SELECT n FROM nn)
                   + {_G1_DAMP} * COALESCE(inflow{k}.inflow,
                                           CAST(0.0 AS DOUBLE)) AS rank
        FROM nodes LEFT JOIN inflow{k} ON nodes.node = inflow{k}.dst
    )""")
    return (
        head
        + "".join(steps)
        + f"\n    SELECT node, rank FROM r{_G1_ITER}"
    )


@register(
    "g1_pagerank_bipartite",
    _g1_oracle(),
    doc="5-iteration PageRank over the user->event_type bipartite "
    "graph: per round one shuffle join (edge list checkpointed + "
    "pre-partitioned once) + one partial-combined hash aggregate; "
    "DECIMAL-exact contribution sums make the float ranks "
    "bit-stable and therefore oracle-hashable.",
)
def g1_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.graph import pagerank

    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    edges = ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t"), F.col("event_type")).alias("dst"),
    )
    return pagerank(
        edges, damping=_G1_DAMP, iterations=_G1_ITER
    ).select("node", "rank")


# ---------------------------------------------------------------------------
# G2 — triangle enumeration over the d2 exact-Jaccard pair graph
# (cluster-density analysis: a triangle is a mutually-similar triple,
# the strongest near-dup signal a pair generator can produce).
# ---------------------------------------------------------------------------
@register(
    "g2_dup_triangles",
    f"""
    WITH {_SQL_JACCARD_CTES},
    e AS (
        SELECT DISTINCT LEAST(doc_a, doc_b) AS a,
                        GREATEST(doc_a, doc_b) AS b
        FROM jpairs WHERE doc_a <> doc_b
    )
    SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
    FROM e e1
    JOIN e e2 ON e1.b = e2.a
    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
    doc="Triangles of the near-dup pair graph, each enumerated once "
    "as an id-sorted triple. Spark side uses degree orientation "
    "(apex = (deg,id)-min vertex) so wedge fan-out is bounded by "
    "O(sqrt(m)) per node even under hub skew; the oracle's simple "
    "id-ordered 3-way join enumerates the same set.",
)
def g2_dup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.graph import triangles

    pairs = ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=3,
        threshold=0.5,
        max_df=_D2_MAX_DF,
    )
    return triangles(pairs, "doc_a", "doc_b")


# ---------------------------------------------------------------------------
# T19 — Gopher-style quality VERDICTS: per-document boolean gates with
# reason flags (t14 computes the metrics; this applies the rules — the
# last step before a corpus filter drops rows). All comparisons are of
# bit-identical doubles (exact-int divisions / distinct-shingle
# fractions), so the integer flags hash cleanly.
# ---------------------------------------------------------------------------
_T19_RULES = (
    # (flag column, min tokens / ratio thresholds chosen to actually
    #  discriminate on the synthetic corpus)
    "n_tokens BETWEEN 30 AND 5000",
    "mean word length in [3, 10]",
    "en-stopword ratio >= 0.05",
    "duplicate 2-gram fraction <= 0.4",
)


@register(
    "t19_quality_verdicts",
    f"""
    WITH t AS (
        SELECT doc_id, text, {_TOKS} AS toks FROM documents
    ), m AS (
        SELECT doc_id,
               len(toks) AS n_tokens,
               CASE WHEN len(toks) > 0 THEN
                   CAST(list_sum(list_transform(toks, x -> len(x)))
                       AS BIGINT) / len(toks) ELSE 0.0 END AS mwl,
               CASE WHEN len(toks) > 0 THEN
                   {T.sql_stopword_hits("toks", "en")} / len(toks)
                   ELSE 0.0 END AS swr,
               {_sql_dup_frac(2)} AS dup2
        FROM t
    )
    SELECT doc_id,
           CAST(n_tokens BETWEEN 30 AND 5000 AS INT) AS ok_length,
           CAST(mwl >= 3.0 AND mwl <= 10.0 AS INT) AS ok_word_len,
           CAST(swr >= 0.05 AS INT) AS ok_stopwords,
           CAST(dup2 <= 0.4 AS INT) AS ok_repetition,
           CAST(n_tokens BETWEEN 30 AND 5000
                AND mwl >= 3.0 AND mwl <= 10.0
                AND swr >= 0.05
                AND dup2 <= 0.4 AS INT) AS keep
    FROM m
    """,
    doc="Gopher-rule verdicts per document: four boolean gates "
    "(length band, mean word length band, stopword-ratio floor, "
    "duplicate-2-gram ceiling) plus the conjunction — the filter "
    "report a corpus-cleaning run logs before dropping rows. Pure "
    "row-local column expressions, zero shuffle.",
)
def t19_quality_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.text import (
        shingles_from_tokens,
        stopword_hits,
        tokens,
    )

    # tokenize ONCE into a column (r14 — the t14 treatment; the
    # guarded gate expressions below are unchanged, they just read
    # the array instead of re-running the tokenizer per gate)
    toks = F.col("__toks")
    n_tokens = F.size(toks)
    mwl = F.when(
        n_tokens > 0,
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )
        / n_tokens,
    ).otherwise(F.lit(0.0))
    swr = F.when(
        n_tokens > 0, stopword_hits(toks, "en") / n_tokens
    ).otherwise(F.lit(0.0))
    dup2 = F.when(
        n_tokens >= 2,
        F.round(
            1.0
            - F.size(shingles_from_tokens(toks, 2)) / (n_tokens - 1),
            6,
        ),
    ).otherwise(F.lit(0.0))
    ok_length = n_tokens.between(30, 5000)
    ok_word_len = (mwl >= 3.0) & (mwl <= 10.0)
    ok_stopwords = swr >= 0.05
    ok_repetition = dup2 <= 0.4
    return table(spark, sf_dir, "documents").withColumn(
        "__toks", tokens(F.col("text"))
    ).select(
        "doc_id",
        ok_length.cast("int").alias("ok_length"),
        ok_word_len.cast("int").alias("ok_word_len"),
        ok_stopwords.cast("int").alias("ok_stopwords"),
        ok_repetition.cast("int").alias("ok_repetition"),
        (ok_length & ok_word_len & ok_stopwords & ok_repetition)
        .cast("int")
        .alias("keep"),
    )


# ---------------------------------------------------------------------------
# T20 — deterministic stratified take-k: exactly min(k, |stratum|)
# docs per language, chosen by md5 rank. Unlike Bernoulli sampling
# (t5's rate-based mix), this yields FIXED per-stratum counts — the
# contract an eval-set builder needs — and is reproducible: the same
# corpus always yields the same sample, and adding documents only
# perturbs the sample marginally (hash rank is stable per doc).
# ---------------------------------------------------------------------------
_T20_K = 20


@register(
    "t20_stratified_take_k",
    f"""
    SELECT doc_id, lang, CAST(rnk AS INT) AS rnk
    FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rnk
        FROM documents
    ) WHERE rnk <= {_T20_K}
    """,
    doc="Deterministic fixed-size per-stratum sample: lang-partitioned "
    "row_number over the md5 hash rank (one shuffle on the stratum "
    "key; the window sorts WITHIN strata only — no global sort).",
)
def t20_stratified_take_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            F.row_number().over(w).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= _T20_K)
    )


# ---------------------------------------------------------------------------
# D6 — edit-distance verification of near-dup candidates: the VERIFY
# stage a fuzzy-dedup pipeline runs after candidate generation.
# Levenshtein is O(len^2) per pair — running it on all pairs is
# impossible at any scale; running it on the O(matches) candidate set
# from the inverted index is the standard sketch-then-verify split
# (d2 generates, d6 verifies at character level).
# ---------------------------------------------------------------------------
@register(
    "d6_edit_distance_pairs",
    f"""
    WITH {_SQL_JACCARD_CTES}
    SELECT p.doc_a, p.doc_b,
           CAST(levenshtein(da.text, db.text) AS INT) AS edit_dist
    FROM jpairs p
    JOIN documents da ON da.doc_id = p.doc_a
    JOIN documents db ON db.doc_id = p.doc_b
    """,
    doc="Character-level Levenshtein distance for every Jaccard "
    "candidate pair: two id-keyed joins re-attach the texts (the "
    "pair generator deliberately drops them — shuffling full texts "
    "through the index join would dominate its cost), then the "
    "built-in JVM levenshtein kernel scores only O(candidates) "
    "pairs, never O(n^2).",
)
def d6_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.dedup_scale import (
        verify_edit_distance,
    )

    docs = table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_df=_D2_MAX_DF
    ).select("doc_a", "doc_b")
    # Uncapped: the oracle reports the distance for EVERY candidate
    # pair. Capped callers pass max_dist for the length-bound prune +
    # banded kernel (see the operator; covered by the skew test).
    return verify_edit_distance(pairs, docs)


# ---------------------------------------------------------------------------
# C2 — decontaminated training corpus: c1 SCANS, c2 ACTS. Train docs
# whose eval overlap exceeds a threshold are dropped via left-anti
# join; the output is what actually ships to the tokenizer. Threshold
# on ABSOLUTE shared 8-grams (>= 3) rather than the fraction: a long
# doc quoting one eval item verbatim has tiny overlap_frac but is
# still contaminated.
# ---------------------------------------------------------------------------
_C2_MIN_SHARED = 3


@register(
    "c2_decontaminated_corpus",
    f"""
    WITH tr AS (
        SELECT doc_id, UNNEST({_SH8}) AS s
        FROM documents WHERE doc_id % 10 != 0
    ), te0 AS (
        SELECT doc_id AS test_id, UNNEST({_SH8}) AS s
        FROM documents WHERE doc_id % 10 = 0
    ), keep AS (
        SELECT s FROM te0 GROUP BY s HAVING COUNT(*) <= {_C1_MAX_DF}
    ), te AS (
        SELECT test_id, te0.s FROM te0 JOIN keep USING (s)
    ), bad AS (
        SELECT tr.doc_id
        FROM tr JOIN te USING (s)
        GROUP BY tr.doc_id
        HAVING COUNT(DISTINCT tr.s) >= {_C2_MIN_SHARED}
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    WHERE d.doc_id % 10 != 0
      AND NOT EXISTS (SELECT 1 FROM bad WHERE bad.doc_id = d.doc_id)
    """,
    doc="Decontaminated train corpus: the c1 inverted-index scan's "
    "flagged ids removed by LEFT ANTI join — the contaminated set is "
    "small, so Spark broadcasts it and the anti-join costs one "
    "corpus scan, no shuffle of the train side.",
)
def c2_decontaminated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.contamination import (
        ngram_contamination,
    )

    docs = table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    test = docs.filter(F.col("doc_id") % 10 == 0)
    flagged = ngram_contamination(
        train.select("doc_id", "text"),
        test.select("doc_id", "text"),
        n=8,
        max_df=_C1_MAX_DF,
    ).filter(F.col("shared_ngrams") >= _C2_MIN_SHARED)
    return train.join(
        F.broadcast(flagged.select("doc_id")), "doc_id", "left_anti"
    ).select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# T21 — unigram-LM document scoring (the CCNet/C4-style model-based
# quality signal): mean token log-probability under the corpus's own
# unigram distribution. Rare-token-heavy (or garbled) docs score low;
# the score ranks documents for quality-tiered sampling. This is the
# simplest member of the model-scoring family — swap the frequency
# join for any token->logprob table (e.g. a KenLM export) and the
# plan shape is unchanged.
# ---------------------------------------------------------------------------
@register(
    "t21_unigram_logprob",
    f"""
    WITH tok AS (
        SELECT doc_id, UNNEST({_TOKS}) AS token FROM documents
    ), vocab AS (
        SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
    ), tot AS (SELECT COUNT(*) AS total FROM tok)
    SELECT tok.doc_id,
           COUNT(*) AS n_tokens,
           ROUND(
               CAST(SUM(CAST(ln(CAST(vocab.cnt AS DOUBLE) / tot.total)
                   AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6
           ) AS mean_logp
    FROM tok JOIN vocab USING (token) CROSS JOIN tot
    GROUP BY tok.doc_id
    """,
    doc="Mean token log-probability under the corpus unigram LM: one "
    "explode feeds both the vocabulary aggregate and the scoring "
    "join (AQE broadcasts the vocab at small SFs, skew-splits the "
    "shuffle at web-corpus vocab sizes); the 1-row token total is "
    "broadcast. Per-token ln values round through DECIMAL(18,6) "
    "before the order-independent sum so JVM-vs-C libm ULP "
    "differences cannot reach the hash.",
)
def t21_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    # toks feeds three branches (vocab agg, corpus total, scoring
    # join); lazy checkpoint = one tokenize pass, not three.
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("token")
    ).localCheckpoint(eager=False)
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    logp = F.log(F.col("cnt").cast("double") / F.col("total"))
    return (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(logp.cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_logp"),
        )
    )


# ---------------------------------------------------------------------------
# T27 — interpolated BIGRAM-LM document scoring (r13 verdict
# directive 6): t21 is a unigram LM; CCNet-class quality scoring
# uses higher-order LMs. This is the next member of the family —
# mean token log-probability under an interpolated bigram model
# built from the corpus's own counts:
#     p(w2 | w1) = λ·c(w1,w2)/c(w1) + (1−λ)·c(w2)/T
# (simple linear interpolation with the unigram distribution, so
# unseen continuations never hit log 0; c(·) are corpus unigram
# counts, T the corpus token total). Bigram instances are encoded as
# 'w1 w2' strings — tokens are [a-z0-9]+ so the space-join is
# injective and one equi-join key covers the pair. Per-instance ln
# values round through DECIMAL(18,6) before the order-independent
# sum (the t21 discipline — JVM-vs-C libm ULP differences cannot
# reach the hash; the λ-mix itself is plain IEEE double arithmetic,
# identical on both engines). Swap the count joins for a KenLM
# export and the plan shape is unchanged — the same claim t21 makes,
# one order higher.
# ---------------------------------------------------------------------------
_T27_LAMBDA = 0.75


@register(
    "t27_bigram_logprob",
    f"""
    WITH tk AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ), tok AS (
        SELECT doc_id, UNNEST(toks) AS token FROM tk
    ), vocab AS (
        SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
    ), tot AS (SELECT COUNT(*) AS total FROM tok),
    bgi AS (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(toks)),
                      i -> toks[i] || ' ' || toks[i + 1])) AS bg
        FROM tk
    ), bgc AS (
        SELECT bg, COUNT(*) AS c12 FROM bgi GROUP BY bg
    )
    SELECT bgi.doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(
               CAST(SUM(CAST(ln(
                   {_T27_LAMBDA} * (CAST(bgc.c12 AS DOUBLE) / v1.cnt)
                   + {1 - _T27_LAMBDA} * (CAST(v2.cnt AS DOUBLE)
                                          / tot.total)
               ) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6
           ) AS mean_logp
    FROM bgi
    JOIN bgc USING (bg)
    JOIN vocab v1 ON string_split(bg, ' ')[1] = v1.token
    JOIN vocab v2 ON string_split(bg, ' ')[2] = v2.token
    CROSS JOIN tot
    GROUP BY bgi.doc_id
    """,
    doc="Mean token log-probability under an interpolated BIGRAM LM "
    "(λ·bigram MLE + (1−λ)·unigram backoff, counts from the corpus "
    "itself): ONE tokenize pass (lazy checkpoint) feeds the unigram "
    "explode (vocab + total) and the bigram-instance explode "
    "(bigram counts + scoring joins); pairs travel as injective "
    "'w1 w2' string keys so each join is a plain equi-join — AQE "
    "broadcasts the count relations at small SFs and skew-splits "
    "the Zipf-head tokens at web scale; counts partial-aggregate "
    "map-side. Per-instance ln rounds through DECIMAL(18,6) before "
    "the order-independent sum (t21 discipline).",
)
def t27_bigram_logprob(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # one tokenize pass feeds both explodes (unigram + bigram)
    tk = (
        table(spark, sf_dir, "documents")
        .select("doc_id", T.tokens(F.col("text")).alias("toks"))
        .localCheckpoint(eager=False)
    )
    tok = tk.select(
        "doc_id", F.explode("toks").alias("token")
    )
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = tok.agg(F.count(F.lit(1)).alias("total"))
    # bigram instances as 'w1 w2' strings (injective: tokens are
    # [a-z0-9]+). transform over 1..size-1; the CASE guards the
    # descending-sequence trap on 0/1-token docs.
    bgi = tk.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(toks) >= 2 THEN "
                "transform(sequence(2, size(toks)), "
                "i -> concat(toks[i - 2], ' ', toks[i - 1])) "
                "ELSE array() END"
            )
        ).alias("bg"),
    )
    bgc = bgi.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    w1 = F.split(F.col("bg"), " ").getItem(0)
    w2 = F.split(F.col("bg"), " ").getItem(1)
    v1 = vocab.select(
        F.col("token").alias("__t1"), F.col("cnt").alias("c1")
    )
    v2 = vocab.select(
        F.col("token").alias("__t2"), F.col("cnt").alias("c2")
    )
    p = F.lit(_T27_LAMBDA) * (
        F.col("c12").cast("double") / F.col("c1")
    ) + F.lit(1 - _T27_LAMBDA) * (
        F.col("c2").cast("double") / F.col("total")
    )
    return (
        bgi.join(bgc, "bg")
        .join(v1, w1 == F.col("__t1"))
        .join(v2, w2 == F.col("__t2"))
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(F.log(p).cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_logp"),
        )
    )


# ---------------------------------------------------------------------------
# T29 — CCNet-style perplexity bucketing: split the corpus into
# head / middle / tail quality tiers by its own LM score
# distribution (CCNet trains a KenLM and buckets by perplexity
# terciles; downstream recipes train on head+middle or sample by
# tier). Here the LM score is t21's mean unigram log-prob (swap in
# t27's bigram score or a KenLM export — the plan shape is
# unchanged), micro-scaled to a BIGINT so the score itself is
# cross-engine exact.
#
# Cutoff discipline (the o5 lesson): general quantile interpolation
# does NOT hash cross-engine (Spark computes (1-g)a+gb, DuckDB
# a+(b-a)g — ULP-different). Median interpolation of INTEGER-valued
# doubles is the exception: the midpoint (a+b)/2 is exact under
# both formulas. So the tiers are quartile-bounded via
# MEDIAN-OF-HALVES — m = median(score), q_lo = median(score <= m),
# q_hi = median(score >= m) — three exact cutoffs, head = top ~25%,
# tail = bottom ~25%, middle the rest: the CCNet tiering with every
# boundary midpoint-representable.
#
# Scale shape: t21's certified plan produces the 1-row-per-doc
# score relation (lazily checkpointed — scored once, read three
# times); the cutoffs are two tiny aggregates whose 1-row results
# broadcast back (the t17/t21 pattern — allowlisted BNLJ); the
# bucket label is a row-local CASE. Nothing new is corpus-shaped.
# ---------------------------------------------------------------------------
def _t29_oracle() -> str:
    from garmin_data_pipeline_spark.plans.registry import QUERIES

    t21 = QUERIES["t21_unigram_logprob"].oracle
    return f"""
    WITH s AS (
        SELECT doc_id,
               CAST(round(mean_logp * 1000000) AS BIGINT)
                   AS score_micro
        FROM ({t21})
    ), m AS (
        SELECT CAST(quantile_cont(CAST(score_micro AS DOUBLE), 0.5)
                    AS DOUBLE) AS med
        FROM s
    ), q AS (
        SELECT
            (SELECT quantile_cont(CAST(score_micro AS DOUBLE), 0.5)
             FROM s, m WHERE score_micro <= med) AS q_lo,
            (SELECT quantile_cont(CAST(score_micro AS DOUBLE), 0.5)
             FROM s, m WHERE score_micro >= med) AS q_hi
    )
    SELECT s.doc_id, s.score_micro,
           CASE WHEN s.score_micro >= q.q_hi THEN 'head'
                WHEN s.score_micro <= q.q_lo THEN 'tail'
                ELSE 'middle' END AS bucket
    FROM s, q
    """


@register(
    "t29_perplexity_buckets",
    _t29_oracle(),
    doc="CCNet-style perplexity tiering: head/middle/tail buckets by "
    "the corpus's own LM score distribution (t21's mean log-prob, "
    "micro-scaled to exact BIGINTs). Cutoffs are median-of-halves "
    "quartiles — the one quantile family whose interpolation is "
    "cross-engine bit-exact on integer-valued inputs (the o5 "
    "midpoint rule). Scale shape: t21's certified plan + two tiny "
    "aggregates broadcast back as 1-row relations + a row-local "
    "CASE; nothing new corpus-shaped.",
)
def t29_perplexity_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # one t21 scoring pass feeds the median, the two half-medians
    # and the final bucketing
    s = (
        t21_unigram_logprob(spark, sf_dir)
        .select(
            "doc_id",
            F.round(F.col("mean_logp") * 1_000_000, 0)
            .cast("bigint")
            .alias("score_micro"),
        )
        .localCheckpoint(eager=False)
    )
    med = s.agg(
        F.expr(
            "percentile(CAST(score_micro AS DOUBLE), 0.5)"
        ).alias("med")
    )
    q = s.crossJoin(F.broadcast(med)).agg(
        F.expr(
            "percentile(CAST(score_micro AS DOUBLE), 0.5) "
            "FILTER (WHERE score_micro <= med)"
        ).alias("q_lo"),
        F.expr(
            "percentile(CAST(score_micro AS DOUBLE), 0.5) "
            "FILTER (WHERE score_micro >= med)"
        ).alias("q_hi"),
    )
    return s.crossJoin(F.broadcast(q)).select(
        "doc_id",
        "score_micro",
        F.when(F.col("score_micro") >= F.col("q_hi"), "head")
        .when(F.col("score_micro") <= F.col("q_lo"), "tail")
        .otherwise("middle")
        .alias("bucket"),
    )


# ---------------------------------------------------------------------------
# V8 — product quantization codes: the memory tier below int8 (64-dim
# float32 256 B -> 8 B at m=8). Oracle generated from the SAME
# codebook constants with the SAME left-fold association order, so
# the per-subspace argmin picks identical codewords on both engines.
# Registered output packs the m 4-bit codes into ONE BIGINT
# (acc*k + code left fold): the driver's canonicalizer hashes scalar
# columns only (pandas sort_values cannot hash list cells — the r7
# `v8_pq_codes` err), and the schema lint in tests/test_scale_ops.py
# now bans complex types in every registered output. The serve path
# (`search_pq_lsh`) keeps consuming the array form internally.
# ---------------------------------------------------------------------------
_PQ_M, _PQ_K, _PQ_SUBDIM = 8, 16, 8


def _pq_code_sql_exprs(
    books: list[list[list[float]]],
    subdim: int,
    vec_sql: str = "embedding",
) -> list[str]:
    """Per-subspace DuckDB argmin expressions mirroring
    ``_pq_subdists``'s left-fold association exactly (float + is not
    associative; the hand-unrolled ``((0.0 + t*t) + t*t)`` chain is
    what keeps the doubles — and so the argmin — bit-identical)."""
    code_exprs = []
    for j, book in enumerate(books):
        dists = []
        for w in book:
            acc = "0.0"
            for i, c in enumerate(w):
                t = (
                    f"(CAST({vec_sql}[{j * subdim + i + 1}] AS DOUBLE)"
                    f" - {c!r})"
                )
                acc = f"({acc} + ({t} * {t}))"
            dists.append(acc)
        lst = "[" + ", ".join(dists) + "]"
        code_exprs.append(
            f"CAST(list_position({lst}, list_min({lst})) - 1 AS INT)"
        )
    return code_exprs


def _pack_sql(code_exprs: list[str], k: int) -> str:
    """Left-fold ``acc*k + code`` packing as SQL arithmetic — the
    mirror of :func:`...operators.similarity.pack_pq_code`."""
    acc = f"CAST({code_exprs[0]} AS BIGINT)"
    for e in code_exprs[1:]:
        acc = f"(({acc}) * {k} + ({e}))"
    return acc


def _v8_oracle() -> str:
    from garmin_data_pipeline_spark.operators.similarity import (
        pq_codebooks,
    )

    books = pq_codebooks(_PQ_M, _PQ_K, _PQ_SUBDIM)
    packed = _pack_sql(
        _pq_code_sql_exprs(books, _PQ_SUBDIM), _PQ_K
    )
    return f"""
    SELECT vec_id,
           CASE WHEN embedding IS NOT NULL
                 AND len(embedding) >= {_PQ_M * _PQ_SUBDIM}
                THEN {packed} END AS pq_packed
    FROM embeddings
    """


@register(
    "v8_pq_codes",
    _v8_oracle(),
    doc="PQ encoding: per-subspace argmin over a deterministic grid "
    "codebook (m=8, k=16) — one scan, zero shuffle, the m*k*subdim "
    "distance lattice fully unrolled into codegen arithmetic; "
    "first-occurrence argmin tiebreak is deterministic on both "
    "engines. A trained codebook drops in without changing the plan. "
    "Output packs the 8 codes into one BIGINT (driver-hashable "
    "scalar); the array form stays internal to the serve path.",
)
def v8_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.similarity import (
        pack_pq_code,
        pq_encode,
    )

    codes = pq_encode(
        table(spark, sf_dir, "embeddings"),
        m=_PQ_M,
        k=_PQ_K,
        subdim=_PQ_SUBDIM,
    )
    return codes.select(
        "vec_id",
        pack_pq_code(F.col("pq_code"), _PQ_K).alias("pq_packed"),
    )


_PQ_SERVE_CACHE: dict[str, DataFrame] = {}


def v8_pq_serve_q500(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only: ADC serving from the PQ index at Q=500 — the
    smallest-footprint serve tier (8 B/vector + bucket id; compare
    v5_int8_serve_q500 at ~64 B and v2mp over raw floats at 256 B).
    Each query precomputes its m x k LUT once; candidates cost m
    element_at adds. Recall is the documented tradeoff (~0.27@10 with
    the grid codebook, test_text_scale_ops.TestPqServe)."""
    from garmin_data_pipeline_spark.operators.similarity import (
        build_pq_lsh_index,
        search_pq_lsh,
    )

    if sf_dir not in _PQ_SERVE_CACHE:
        _PQ_SERVE_CACHE[sf_dir] = build_pq_lsh_index(
            table(spark, sf_dir, "embeddings"), n_planes=8, dim=64
        ).persist()
    index = _PQ_SERVE_CACHE[sf_dir]
    emb = table(spark, sf_dir, "embeddings")
    return search_pq_lsh(
        index, _serve_queries(emb), k=10, n_planes=8, dim=64,
        probe_hamming=_PROBE_RADIUS,
    )


_PQT_SERVE_CACHE: dict[str, tuple[DataFrame, list]] = {}


def v8t_pq_serve_q500(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only: v8 ADC serving with TRAINED per-subspace codebooks
    (k-means on a seeded corpus sample via fit_pq_codebooks — the
    'trained codebook drops in without changing the plan' claim made
    by v8_pq_codes, demonstrated: identical plan shape, only the
    codeword literals differ; trained-vs-grid quality is pinned by
    test_text_scale_ops.TestPqTrainedCodebooks). The fit runs once
    per sf_dir during warm-up (cached with the index — a standing
    deployment trains offline); the timed region is serve-only,
    directly comparable to v8_pq_serve_q500."""
    from garmin_data_pipeline_spark.operators.similarity import (
        build_pq_lsh_index,
        fit_pq_codebooks,
        search_pq_lsh,
    )

    if sf_dir not in _PQT_SERVE_CACHE:
        emb = table(spark, sf_dir, "embeddings")
        books = fit_pq_codebooks(
            emb, m=_PQ_M, k=_PQ_K, subdim=_PQ_SUBDIM,
            sample_fraction=0.1,
        )
        _PQT_SERVE_CACHE[sf_dir] = (
            build_pq_lsh_index(
                emb, n_planes=8, dim=64, books=books
            ).persist(),
            books,
        )
    index, books = _PQT_SERVE_CACHE[sf_dir]
    emb = table(spark, sf_dir, "embeddings")
    return search_pq_lsh(
        index, _serve_queries(emb), k=10, n_planes=8, dim=64,
        probe_hamming=_PROBE_RADIUS, books=books,
    )


_IVFPQ_SERVE_CACHE: dict[str, tuple] = {}


def v9_ivfpq_serve_q500(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only: IVFADC serving (IVF cells + trained residual PQ,
    Jégou et al.) at Q=500 — the industry-standard composed index.
    Same 8-byte code budget as v8/v8t but the codes quantize cell
    RESIDUALS (smaller spread => finer codes), so at this function's
    n_probe=16 (1/4 of the 64 cells — the recall/wall knob) it clears
    both on recall: 0.387@10 vs v8t's 0.267 on the fixture (SERVING.md
    / test_serving_guide.py; the tighter n_probe=4 unit-test shape
    measures 0.322 vs 0.268). Build (KMeans + residual fit + encode)
    runs once per sf_dir in warm-up; the timed region is serve-only."""
    from garmin_data_pipeline_spark.operators.similarity import (
        build_ivf_pq_index,
        search_ivf_pq,
    )

    if sf_dir not in _IVFPQ_SERVE_CACHE:
        emb = table(spark, sf_dir, "embeddings")
        index, cents, books = build_ivf_pq_index(
            emb, n_centroids=64, sample_fraction=0.1,
            m=_PQ_M, k=_PQ_K, subdim=_PQ_SUBDIM,
        )
        _IVFPQ_SERVE_CACHE[sf_dir] = (index.persist(), cents, books)
    index, cents, books = _IVFPQ_SERVE_CACHE[sf_dir]
    emb = table(spark, sf_dir, "embeddings")
    return search_ivf_pq(
        index, cents, books, _serve_queries(emb), k=10, n_probe=16,
        pq_m=_PQ_M, pq_k=_PQ_K, subdim=_PQ_SUBDIM,
    )


def v9r_ivfpq_rerank_serve_q500(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bench-only: IVFADC + exact re-rank (IVFADC+R — the refinement
    stage production ANN serves bolt onto a quantized index). Same
    index/cells/books as v9 (shared build cache — the refinement is
    a serve-time choice, not a different index); stage 1 shortlists
    50 candidates per query by ADC, stage 2 re-scores only those
    queries x 50 rows with exact cosine against the raw vectors.
    Recall is then bounded by shortlist candidate recall instead of
    8-byte code resolution. The raw-vector side stays a single
    un-shuffled scan (broadcast shortlist bhj), so the memory story
    holds: the INDEX is 8 B/vector; the raw vectors are only scanned,
    never sorted or shuffled."""
    from garmin_data_pipeline_spark.operators.similarity import (
        build_ivf_pq_index,
        search_ivf_pq_rerank,
    )

    if sf_dir not in _IVFPQ_SERVE_CACHE:
        emb = table(spark, sf_dir, "embeddings")
        index, cents, books = build_ivf_pq_index(
            emb, n_centroids=64, sample_fraction=0.1,
            m=_PQ_M, k=_PQ_K, subdim=_PQ_SUBDIM,
        )
        _IVFPQ_SERVE_CACHE[sf_dir] = (index.persist(), cents, books)
    index, cents, books = _IVFPQ_SERVE_CACHE[sf_dir]
    emb = table(spark, sf_dir, "embeddings")
    return search_ivf_pq_rerank(
        index, cents, books, _serve_queries(emb), emb,
        k=10, shortlist=50, n_probe=16,
        pq_m=_PQ_M, pq_k=_PQ_K, subdim=_PQ_SUBDIM,
    )

_IVFPQ_PROD_SERVE_CACHE: dict[str, tuple] = {}


def v9ps_ivfpq_product_serve_q500(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bench-only: IVFADC serving over the PRODUCT-assigned index
    (inverted multi-index, both halves of it): the coarse level is
    two ~sqrt(C) half-space codebooks — the build never runs the
    flat n x C transform, and the SERVE ranks cells per half
    (2*sqrt(C) half-dim chains per query + a per_half^2 pair
    re-rank) instead of scanning a C-row centroid table. At this
    bench's fixed C=64 that saves little (and the extra coarse fit
    makes the BUILD slower here — see sf1_probe's v9pr vs v9 build
    walls); the tier exists because at corpus-scaled C
    (C = n/occupancy, the SemDeDup regime) neither a C-row broadcast
    table nor a per-vector C-dot scan survives, and this plan shape
    is the one that does. Same residual-PQ books, same
    1-Exchange/bhj serve, index immobile."""
    from garmin_data_pipeline_spark.operators.similarity import (
        build_ivf_pq_index,
        fit_coarse_half_books,
        search_ivf_pq_product,
    )

    if sf_dir not in _IVFPQ_PROD_SERVE_CACHE:
        emb = table(spark, sf_dir, "embeddings")
        coarse = fit_coarse_half_books(
            emb, n_centroids=64, sample_fraction=0.1
        )
        index, _, books = build_ivf_pq_index(
            emb, n_centroids=64, sample_fraction=0.1,
            m=_PQ_M, k=_PQ_K, subdim=_PQ_SUBDIM,
            product_assignment=True, coarse_books=coarse,
        )
        _IVFPQ_PROD_SERVE_CACHE[sf_dir] = (
            index.persist(), coarse, books,
        )
    index, coarse, books = _IVFPQ_PROD_SERVE_CACHE[sf_dir]
    emb = table(spark, sf_dir, "embeddings")
    return search_ivf_pq_product(
        index, coarse, books, _serve_queries(emb), k=10,
        n_probe=16, per_half=8,
        pq_m=_PQ_M, pq_k=_PQ_K, subdim=_PQ_SUBDIM,
    )


# ---------------------------------------------------------------------------
# V9P — oracle-certified IVFADC twin (r7 verdict directive 4): the
# flagship serve tier's build machinery (coarse cell assignment ->
# residual -> per-subspace argmin PQ) with every nondeterministic
# piece pinned — grid centroids at data scale for max-dot assignment
# (the plumbing v4p already certified), grid residual codebooks, and
# the packed-BIGINT code representation (driver-hashable scalars; see
# the schema lint). v9 stays the production KMeans+trained fit; this
# row proves the composed pipeline bit-for-bit against DuckDB.
# ---------------------------------------------------------------------------
_V9P_CELLS = 16


def _v9p_oracle() -> str:
    from garmin_data_pipeline_spark.operators.similarity import (
        ivf_pq_grid_centroids,
        pq_codebooks,
    )

    cents = ivf_pq_grid_centroids(_V9P_CELLS, 64)
    books = pq_codebooks(_PQ_M, _PQ_K, _PQ_SUBDIM, scale=0.25)
    packed = _pack_sql(
        _pq_code_sql_exprs(books, _PQ_SUBDIM, vec_sql="rv"), _PQ_K
    )
    return f"""
    WITH c AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
        WHERE embedding IS NOT NULL AND len(embedding) >= 64
    ), cent(cell, cv) AS (
        VALUES {_cent_values_sql(cents)}
    ), assigned AS (
        -- coarse quantization: max-dot cell, ties to the lowest cell
        -- (identical ordering to assign_cells_fixed's max_by struct)
        SELECT vec_id, v, cell, cv FROM (
            SELECT vec_id, v, cell, cv,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id
                       ORDER BY COALESCE(list_dot_product(v, cv), -1e300)
                                DESC, cell
                   ) AS arank
            FROM c CROSS JOIN cent
        ) WHERE arank = 1
    ), resid AS (
        -- same association as Spark's zip_with(v, centroid, a - b)
        SELECT vec_id, cell,
               list_transform(range(1, 65), i -> v[i] - cv[i]) AS rv
        FROM assigned
    )
    SELECT vec_id, CAST(cell AS INT) AS cell, {packed} AS pq_packed
    FROM resid
    """


@register(
    "v9p_ivfpq_codes_grid",
    _v9p_oracle(),
    doc="IVFADC build, oracle-certified twin: max-dot coarse cell "
    "assignment against a fixed data-scale codebook, residual vs the "
    "cell centroid, per-subspace argmin PQ on the residual, codes "
    "packed to one BIGINT. Certifies the composed IVF->residual->PQ "
    "machinery the production v9 (KMeans + trained books) runs; "
    "broadcast centroid scoring + max_by assignment (one shuffle), "
    "zero-shuffle encode.",
)
def v9p_ivfpq_codes_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from garmin_data_pipeline_spark.operators.similarity import (
        build_ivf_pq_grid_index,
        pack_pq_code,
    )

    idx = build_ivf_pq_grid_index(
        table(spark, sf_dir, "embeddings"),
        n_cells=_V9P_CELLS,
        dim=64,
        m=_PQ_M,
        k=_PQ_K,
        subdim=_PQ_SUBDIM,
    )
    return idx.select(
        "vec_id",
        "cell",
        pack_pq_code(F.col("pq_code"), _PQ_K).alias("pq_packed"),
    )


# ---------------------------------------------------------------------------
# V9RP — oracle-certified IVFADC + exact-rerank twin (r8 verdict
# directive 2): the LAST uncertified serve stage. v9p certifies the
# build (cells -> residual -> codes); this row certifies the SERVE —
# per-query probe-cell ranking (exact L2 to the grid centroids), the
# per-(query, cell) residual ADC LUT, the shortlist-by-ADC rank, and
# the exact-cosine rerank of the shortlist — all bit-for-bit against
# DuckDB. Every float comparison either reproduces the identical
# IEEE left-fold on both engines (the v9p/v8 association discipline)
# or is integer-tie-broken by vec_id/cell; the only rounding is the
# certified F.round(cosine, 6) the whole v1/v2/v4p family uses.
# v9r stays the production twin (trained books, Q=500, bench-priced).
# ---------------------------------------------------------------------------
def _pq_lut_sql_lists(
    books: list[list[list[float]]],
    subdim: int,
    vec_sql: str = "rq",
) -> list[str]:
    """m DuckDB list expressions of k hand-unrolled subspace squared
    distances over a double list — the oracle's ADC LUT, mirroring
    ``_pq_subdists``'s ``((0.0 + t*t) + t*t)...`` association (the
    input is already DOUBLE here — no element cast, exactly like the
    Spark side where rq is a computed double array)."""
    luts = []
    for j, book in enumerate(books):
        dists = []
        for w in book:
            acc = "0.0"
            for i, c in enumerate(w):
                t = f"({vec_sql}[{j * subdim + i + 1}] - {c!r})"
                acc = f"({acc} + ({t} * {t}))"
            dists.append(acc)
        luts.append("[" + ", ".join(dists) + "]")
    return luts


_V9RP_PROBE = 4
_V9RP_SHORTLIST = 50


def _v9rp_oracle() -> str:
    from garmin_data_pipeline_spark.operators.similarity import (
        ivf_pq_grid_centroids,
        pq_codebooks,
    )

    cents = ivf_pq_grid_centroids(_V9P_CELLS, 64)
    books = pq_codebooks(_PQ_M, _PQ_K, _PQ_SUBDIM, scale=0.25)
    codes = _pq_code_sql_exprs(books, _PQ_SUBDIM, vec_sql="rv")
    code_cols = ", ".join(
        f"{e} AS c{j}" for j, e in enumerate(codes)
    )
    luts = _pq_lut_sql_lists(books, _PQ_SUBDIM, vec_sql="rq")
    lut_cols = ", ".join(f"{e} AS l{j}" for j, e in enumerate(luts))
    # _adc_fold's left fold: ((0.0 + lut[0][c0+1]) + lut[1][c1+1])...
    adc = "0.0"
    for j in range(_PQ_M):
        adc = f"({adc} + l{j}[c{j} + 1])"
    return f"""
    WITH c AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
        WHERE embedding IS NOT NULL AND len(embedding) >= 64
    ), cent(cell, cv) AS (
        VALUES {_cent_values_sql(cents)}
    ), assigned AS (
        SELECT vec_id, v, cell, cv FROM (
            SELECT vec_id, v, cell, cv,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id
                       ORDER BY COALESCE(list_dot_product(v, cv), -1e300)
                                DESC, cell
                   ) AS arank
            FROM c CROSS JOIN cent
        ) WHERE arank = 1
    ), codes AS (
        -- the indexed corpus: coarse cell + per-subspace argmin codes
        -- over the residual (identical to the v9p-certified build)
        SELECT vec_id, cell, {code_cols}
        FROM (
            SELECT vec_id, cell,
                   list_transform(range(1, 65), i -> v[i] - cv[i]) AS rv
            FROM assigned
        )
    ), q AS (
        SELECT vec_id AS query_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id < 5
    ), qcd AS (
        -- query residual vs EVERY cell; rq doubles as the L2 probe
        -- metric input and the ADC LUT input (same as Spark's rq)
        SELECT query_id, qv, cell,
               list_transform(range(1, 65), i -> qv[i] - cv[i]) AS rq
        FROM q CROSS JOIN cent
    ), qc AS (
        SELECT query_id, qv, cell, rq FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY list_dot_product(rq, rq) ASC, cell
            ) AS crank FROM qcd
        ) WHERE crank <= {_V9RP_PROBE}
    ), luts AS (
        SELECT query_id, cell, {lut_cols} FROM qc
    ), short AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY {adc} ASC, vec_id
            ) AS srank
            FROM codes JOIN luts USING (cell)
        ) WHERE srank <= {_V9RP_SHORTLIST}
    ), scored AS (
        SELECT query_id, s.vec_id, {_COS} AS cos_raw
        FROM short s
        JOIN c ON s.vec_id = c.vec_id
        JOIN q USING (query_id)
        WHERE {_COS} IS NOT NULL
    )
    SELECT query_id, vec_id, ROUND(cos_raw, 6) AS cosine,
           CAST(rnk AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos_raw DESC, vec_id
        ) AS rnk FROM scored
    ) WHERE rnk <= 10
    """


@register(
    "v9rp_ivfpq_rerank_grid",
    _v9rp_oracle(),
    doc="IVFADC + exact-rerank serve, oracle-certified twin: probe "
    "the 4 nearest grid cells per query (exact L2), score probed-cell "
    "candidates via the residual ADC LUT (m table lookups each), "
    "shortlist 50 by ADC rank, re-score the shortlist with exact "
    "cosine and keep the top 10. Certifies the full serve pipeline "
    "v9r runs with trained books; index never shuffles (broadcast "
    "LUT bhj), rerank is one broadcast-shortlist scan of the raw "
    "corpus.",
)
def v9rp_ivfpq_rerank_grid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from garmin_data_pipeline_spark.operators.similarity import (
        _centroid_df,
        build_ivf_pq_grid_index,
        ivf_pq_grid_centroids,
        pq_codebooks,
        search_ivf_pq_rerank,
    )

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    index = build_ivf_pq_grid_index(
        emb,
        n_cells=_V9P_CELLS,
        dim=64,
        m=_PQ_M,
        k=_PQ_K,
        subdim=_PQ_SUBDIM,
    )
    cents = _centroid_df(
        spark, ivf_pq_grid_centroids(_V9P_CELLS, 64)
    )
    books = pq_codebooks(_PQ_M, _PQ_K, _PQ_SUBDIM, scale=0.25)
    out = search_ivf_pq_rerank(
        index,
        cents,
        books,
        queries,
        emb,
        k=10,
        shortlist=_V9RP_SHORTLIST,
        n_probe=_V9RP_PROBE,
        pq_m=_PQ_M,
        pq_k=_PQ_K,
        subdim=_PQ_SUBDIM,
    )
    return out.select(
        "query_id",
        "vec_id",
        F.round("cosine", 6).alias("cosine"),
        "rank",
    )


# ---------------------------------------------------------------------------
# V9PSS — oracle-certified inverted-multi-index SERVE twin (r9
# verdict directive 8): v9ps's per-half probe ranking was certified
# only TRANSITIVELY (pytest pin: per_half = sqrt(C) is bit-equal to
# the flat ranking, which v9rp certifies). This row certifies the
# IMI serve DIRECTLY, including the per-half approximation at
# per_half < kc: grid coarse HALF-books (per-half argmin assignment
# — the same _pq_code_sql_exprs association v9p certified for
# residual codes), pair-cell packing, per-half probe ranking, pair
# re-rank by d0+d1, per-pair residual vs the two half-codewords, ADC
# LUT scoring, and the top-10-by-ADC pick — all bit-for-bit against
# DuckDB. Nothing C-sized exists on either engine's plan: both sides
# touch only the two kc-row half-books.
# ---------------------------------------------------------------------------
_V9PSS_KC = 8          # 8 x 8 = 64 pair cells
_V9PSS_PROBE = 4
_V9PSS_PER_HALF = 4    # < kc: the approximation is exercised


def _v9pss_oracle() -> str:
    from garmin_data_pipeline_spark.operators.similarity import (
        pq_codebooks,
    )

    kc = _V9PSS_KC
    coarse = pq_codebooks(2, kc, 32, scale=0.125)
    books = pq_codebooks(_PQ_M, _PQ_K, _PQ_SUBDIM, scale=0.25)
    a0, a1 = _pq_code_sql_exprs(coarse, 32, vec_sql="v")
    codes = _pq_code_sql_exprs(books, _PQ_SUBDIM, vec_sql="rv")
    code_cols = ", ".join(f"{e} AS c{j}" for j, e in enumerate(codes))
    la, lb = _pq_lut_sql_lists(coarse, 32, vec_sql="qv")
    luts = _pq_lut_sql_lists(books, _PQ_SUBDIM, vec_sql="rq")
    lut_cols = ", ".join(f"{e} AS l{j}" for j, e in enumerate(luts))
    adc = "0.0"
    for j in range(_PQ_M):
        adc = f"({adc} + l{j}[c{j} + 1])"
    return f"""
    WITH c AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
        WHERE embedding IS NOT NULL AND len(embedding) >= 64
    ), ca(code, av) AS (
        VALUES {_cent_values_sql(coarse[0])}
    ), cb(code, bv) AS (
        VALUES {_cent_values_sql(coarse[1])}
    ), acode AS (
        -- per-half argmin coarse codes (the IMI assignment)
        SELECT vec_id, v, {a0} AS a0, {a1} AS a1 FROM c
    ), codes AS (
        SELECT vec_id, cell, {code_cols} FROM (
            SELECT vec_id, a0 * {kc} + a1 AS cell,
                   list_concat(
                       list_transform(range(1, 33),
                                      i -> v[i] - av[i]),
                       list_transform(range(1, 33),
                                      i -> v[i + 32] - bv[i])
                   ) AS rv
            FROM acode
            JOIN ca ON acode.a0 = ca.code
            JOIN cb ON acode.a1 = cb.code
        )
    ), q AS (
        SELECT vec_id AS query_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id < 5
    ), qh AS (
        SELECT query_id, qv, {la} AS la, {lb} AS lb FROM q
    ), tha AS (
        SELECT query_id, qv, ha, da FROM (
            SELECT query_id, qv, g.code AS ha,
                   la[g.code + 1] AS da,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY la[g.code + 1] ASC, g.code
                   ) AS hrank
            FROM qh CROSS JOIN
                 (SELECT unnest(range(0, {kc})) AS code) g
        ) WHERE hrank <= {_V9PSS_PER_HALF}
    ), thb AS (
        SELECT query_id, hb, db FROM (
            SELECT query_id, g.code AS hb,
                   lb[g.code + 1] AS db,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY lb[g.code + 1] ASC, g.code
                   ) AS hrank
            FROM qh CROSS JOIN
                 (SELECT unnest(range(0, {kc})) AS code) g
        ) WHERE hrank <= {_V9PSS_PER_HALF}
    ), probed AS (
        -- d0 + d1 IS the exact L2 to the concatenated pair centroid
        SELECT query_id, qv, ha, hb FROM (
            SELECT tha.query_id, qv, ha, hb,
                   ROW_NUMBER() OVER (
                       PARTITION BY tha.query_id
                       ORDER BY (da + db) ASC, ha, hb
                   ) AS prank
            FROM tha JOIN thb ON tha.query_id = thb.query_id
        ) WHERE prank <= {_V9PSS_PROBE}
    ), luts AS (
        SELECT query_id, cell, {lut_cols} FROM (
            SELECT query_id, ha * {kc} + hb AS cell,
                   list_concat(
                       list_transform(range(1, 33),
                                      i -> qv[i] - av[i]),
                       list_transform(range(1, 33),
                                      i -> qv[i + 32] - bv[i])
                   ) AS rq
            FROM probed
            JOIN ca ON probed.ha = ca.code
            JOIN cb ON probed.hb = cb.code
        )
    ), scored AS (
        SELECT query_id, vec_id, {adc} AS adc
        FROM codes JOIN luts USING (cell)
    )
    SELECT query_id, vec_id, ROUND(adc, 6) AS adc_r6,
           CAST(rnk AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY adc ASC, vec_id
        ) AS rnk FROM scored
    ) WHERE rnk <= 10
    """


@register(
    "v9pss_imi_serve_grid",
    _v9pss_oracle(),
    doc="Inverted-multi-index serve, oracle-certified twin: per-half "
    "argmin assignment into pair cells, per-half probe ranking (top "
    "per_half of kc half-dim distance chains per half), pair re-rank "
    "by d0+d1, residual ADC LUT scoring of the probed cells, top-10 "
    "by ADC. Certifies search_ivf_pq_product directly at "
    "per_half < kc; nothing C-sized at build or serve on either "
    "engine.",
)
def v9pss_imi_serve_grid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from garmin_data_pipeline_spark.operators.similarity import (
        build_ivf_pq_grid_index_product,
        search_ivf_pq_product,
    )

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    index, coarse, books = build_ivf_pq_grid_index_product(
        emb, kc=_V9PSS_KC, dim=64,
        m=_PQ_M, k=_PQ_K, subdim=_PQ_SUBDIM,
    )
    out = search_ivf_pq_product(
        index, coarse, books, queries,
        k=10, n_probe=_V9PSS_PROBE, per_half=_V9PSS_PER_HALF,
        pq_m=_PQ_M, pq_k=_PQ_K, subdim=_PQ_SUBDIM,
    )
    return out.select(
        "query_id",
        "vec_id",
        F.round("adc_dist", 6).alias("adc_r6"),
        "rank",
    )


# ---------------------------------------------------------------------------
# D7 — canonical-document selection: the RETENTION half of a dedup
# purge. d5 resolves the near-dup clusters; this picks ONE
# representative per cluster (the longest text, ties to the lowest
# doc_id — the "keep the most complete copy" policy web-corpus
# pipelines apply after clustering) and keeps every singleton
# untouched. Output is exactly the post-dedup corpus manifest.
# ---------------------------------------------------------------------------
@register(
    "d7_canonical_docs",
    f"""
    WITH RECURSIVE {_SQL_JACCARD_CTES},
    e AS (
        SELECT doc_a AS a, doc_b AS b FROM jpairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM jpairs
    ),
    reach(n, r) AS (
        SELECT a, a FROM e
        UNION
        SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.n
    ),
    comp AS (
        SELECT n AS doc_id, MIN(r) AS group_id FROM reach GROUP BY n
    ),
    sized AS (
        SELECT doc_id, group_id,
               COUNT(*) OVER (PARTITION BY group_id) AS group_size
        FROM comp
    ),
    m AS (
        SELECT d.doc_id,
               COALESCE(s.group_id, d.doc_id) AS group_id,
               COALESCE(s.group_size, 1) AS group_size,
               length(d.text) AS text_len
        FROM documents d LEFT JOIN sized s USING (doc_id)
    )
    SELECT group_id, doc_id AS kept_doc, group_size, text_len
    FROM m
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY group_id ORDER BY text_len DESC, doc_id) = 1
    """,
    doc="Canonical-doc selection per near-dup cluster: connected "
    "components over the d2 Jaccard pair graph (the d5 machinery), "
    "left-joined back to the full corpus so singletons keep "
    "themselves, then one representative per group by (text_len "
    "DESC, doc_id) row_number — a PARTITIONED window, never a "
    "global sort. Integer-only ordering keys, so the pick is "
    "cross-engine exact. At 100 TB the group table is "
    "O(clustered docs) << corpus and AQE broadcasts it into the "
    "left join.",
)
def d7_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from garmin_data_pipeline_spark.operators.graph import (
        duplicate_groups,
    )

    docs = table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_df=_D2_MAX_DF
    )
    groups = duplicate_groups(pairs, "doc_a", "doc_b")
    return _canonical_pick(docs, groups)


def _canonical_pick(docs: DataFrame, groups: DataFrame) -> DataFrame:
    """The retention stage shared by d7 (exact-Jaccard pairs, the
    oracle row) and d7_canonical_docs_lsh (MinHash candidates, the
    scale path): AQE-broadcast left join of the (small) group table
    back onto the corpus, singletons keep themselves, one
    representative per group by (text_len DESC, doc_id) — a
    PARTITIONED window, never a global sort."""
    from pyspark.sql.window import Window

    m = docs.join(groups, "doc_id", "left").select(
        "doc_id",
        F.coalesce("group_id", "doc_id").alias("group_id"),
        F.coalesce("group_size", F.lit(1).cast("long")).alias(
            "group_size"
        ),
        F.length("text").cast("long").alias("text_len"),
    )
    w = Window.partitionBy("group_id").orderBy(
        F.col("text_len").desc(), F.col("doc_id")
    )
    return (
        m.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "group_id",
            F.col("doc_id").alias("kept_doc"),
            "group_size",
            "text_len",
        )
    )


def d7_canonical_docs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only (r8 verdict directive 4): the dedup-purge RETENTION
    composition a 100 TB run actually executes — MinHash-LSH
    candidate pairs (d3's banded scale path, never all-pairs) ->
    connected components -> per-cluster canonical pick. Registered
    d7 keeps the d2 exact-Jaccard pair input because that is what
    the recursive-CTE oracle can mirror; this entry prices the scale
    shape (mirroring how d5_groups_lsh composes over d5)."""
    from garmin_data_pipeline_spark.operators.dedup_scale import (
        minhash_lsh_pairs,
    )
    from garmin_data_pipeline_spark.operators.graph import (
        duplicate_groups,
    )

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text")
    groups = duplicate_groups(pairs, "doc_a", "doc_b")
    return _canonical_pick(docs, groups)


# d7p: the LSH-composed purge pipeline under the md5 parity hash —
# the r10 verdict's directive 6. d7_canonical_docs_lsh above prices
# the scale shape but its correctness was only TRANSITIVE (d3p + d5 +
# d7 certified separately); this twin runs the IDENTICAL composition
# (LSH candidates -> connected components -> canonical pick) with the
# md5-derived MinHash the DuckDB oracle can replay, certifying the
# composed pipeline end to end (the v9pss recipe applied to dedup).
@register(
    "d7p_canonical_docs_lsh",
    f"""
    WITH RECURSIVE {_sql_minhash_lsh_ctes(num_hashes=32, bands=8)},
    jpairs AS (
        SELECT doc_a, doc_b FROM scored WHERE est_jaccard >= 0.5
    ),
    e AS (
        SELECT doc_a AS a, doc_b AS b FROM jpairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM jpairs
    ),
    reach(n, r) AS (
        SELECT a, a FROM e
        UNION
        SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.n
    ),
    comp AS (
        SELECT n AS doc_id, MIN(r) AS group_id FROM reach GROUP BY n
    ),
    sized AS (
        SELECT doc_id, group_id,
               COUNT(*) OVER (PARTITION BY group_id) AS group_size
        FROM comp
    ),
    m AS (
        SELECT d.doc_id,
               COALESCE(s.group_id, d.doc_id) AS group_id,
               COALESCE(s.group_size, 1) AS group_size,
               length(d.text) AS text_len
        FROM documents d LEFT JOIN sized s USING (doc_id)
    )
    SELECT group_id, doc_id AS kept_doc, group_size, text_len
    FROM m
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY group_id ORDER BY text_len DESC, doc_id) = 1
    """,
    doc="The dedup-purge RETENTION composition end to end under the "
    "md5 parity hash: MinHash-LSH candidate pairs (banded, never "
    "all-pairs) -> connected components -> one canonical doc per "
    "cluster by (text_len DESC, doc_id), singletons kept. Oracle "
    "replays the full chain (signatures, banding, estimated "
    "Jaccard, recursive-CTE reachability, QUALIFY pick) so the "
    "COMPOSED pipeline is hash-certified, not just its stages.",
)
def d7p_canonical_docs_lsh(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from garmin_data_pipeline_spark.operators.graph import (
        duplicate_groups,
    )

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs,
        "doc_id",
        "text",
        num_hashes=32,
        bands=8,
        shingle_n=3,
        threshold=0.5,
        hash_impl="md5",
    )
    groups = duplicate_groups(pairs, "doc_a", "doc_b")
    return _canonical_pick(docs, groups)


# ---------------------------------------------------------------------------
# T23 — n-gram novelty: per document, the fraction of its distinct
# 3-gram shingles that NO earlier document (by doc_id — ingestion
# order) contains. The dataset-curation freshness signal: a crawl
# whose novelty curve collapses is re-crawling itself; dedup-adjacent
# but measures marginal contribution, not pairwise similarity.
# Integer-only arithmetic (counts + floor-scaled ratio), so the hash
# is trivially cross-engine exact. Docs with zero shingles drop out
# (no marginal contribution to measure) — both engines agree via the
# inner join.
# Scale shape: one shingle explode (shared via lazy checkpoint
# between the first-seen aggregate and the per-doc count — the t22
# lesson), one gram-keyed aggregate, one gram-keyed join back, one
# doc-keyed aggregate. At 100 TB the gram->first_doc table is the
# big side and stays partitioned by gram; nothing is collected.
# ---------------------------------------------------------------------------
@register(
    "t23_ngram_novelty",
    f"""
    WITH sh AS (
        SELECT doc_id, UNNEST({T.sql_shingles(_TOKS, 3)}) AS s
        FROM documents
    ), firsts AS (
        SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s
    )
    SELECT sh.doc_id,
           CAST(SUM(CASE WHEN first_doc = sh.doc_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS novel_grams,
           COUNT(*) AS total_grams,
           CAST((SUM(CASE WHEN first_doc = sh.doc_id
                          THEN 1 ELSE 0 END) * 1000000) // COUNT(*)
                AS BIGINT) AS novelty_e6
    FROM sh JOIN firsts USING (s)
    GROUP BY sh.doc_id
    """,
    doc="Per-document n-gram novelty: the fraction of a doc's "
    "distinct 3-gram shingles first seen in THAT doc (ingestion "
    "order by doc_id) — the marginal-contribution signal a "
    "curation run tracks alongside dedup. Integer counts + "
    "floor-scaled ratio (engine-exact); one explode, one gram "
    "aggregate, one gram join, one doc aggregate.",
)
def t23_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(T.shingles(F.col("text"), 3)).alias("s")
    ).localCheckpoint(eager=False)
    firsts = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    agg = (
        sh.join(firsts, "s")
        .groupBy("doc_id")
        .agg(
            F.sum(
                (F.col("first_doc") == F.col("doc_id")).cast("long")
            ).alias("novel_grams"),
            F.count(F.lit(1)).alias("total_grams"),
        )
    )
    return agg.select(
        "doc_id",
        "novel_grams",
        "total_grams",
        F.expr("(novel_grams * 1000000) div total_grams").alias(
            "novelty_e6"
        ),
    )


# ---------------------------------------------------------------------------
# T22 — LM-quality z-score: t21's mean unigram log-probability,
# standardized against the corpus distribution (the form CCNet-style
# pipelines threshold on: "keep docs above z = -1", robust to corpus
# drift where a raw logprob cutoff is not). Moments are computed from
# the ROUNDED t21 scores with DECIMAL-exact sums, so both engines
# standardize the identical value set; sqrt is IEEE
# correctly-rounded, and the final z rounds to 6.
# ---------------------------------------------------------------------------
@register(
    "t22_lm_quality_zscore",
    f"""
    WITH tok AS (
        SELECT doc_id, UNNEST({_TOKS}) AS token FROM documents
    ), vocab AS (
        SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
    ), tot AS (SELECT COUNT(*) AS total FROM tok),
    scores AS (
        SELECT tok.doc_id,
               COUNT(*) AS n_tokens,
               ROUND(
                   CAST(SUM(CAST(ln(CAST(vocab.cnt AS DOUBLE) / tot.total)
                       AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6
               ) AS mean_logp
        FROM tok JOIN vocab USING (token) CROSS JOIN tot
        GROUP BY tok.doc_id
    ), mom AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(mean_logp AS DECIMAL(18,6)))
                   AS DOUBLE) AS s1,
               CAST(SUM(CAST(mean_logp * mean_logp AS DECIMAL(38,12)))
                   AS DOUBLE) AS s2
        FROM scores
    )
    SELECT doc_id, n_tokens, mean_logp,
           ROUND((mean_logp - s1 / n)
                 / sqrt(s2 / n - (s1 / n) * (s1 / n)), 6) AS lm_zscore
    FROM scores CROSS JOIN mom
    """,
    doc="Model-based quality score, corpus-standardized: t21's mean "
    "unigram logprob plus a z-score against corpus moments. ONE "
    "extra aggregate over the O(docs) score table and a broadcast "
    "1-row cross join — the tokenize/vocab work is shared with t21's "
    "single-pass shape. Moments accumulate the rounded scores in "
    "DECIMAL (sum and sum-of-squares are exact: 6-decimal inputs, "
    "12-decimal squares), variance arithmetic and sqrt are "
    "IEEE-deterministic, so the z-scores hash-match.",
)
def t22_lm_quality_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scores feeds two branches (corpus moments + the standardized
    # output); lazy checkpoint = one tokenize/score pass, not two
    # (without it the audit counted 7 shuffles — t21's whole subtree
    # duplicated under the moments aggregate).
    scores = t21_unigram_logprob(spark, sf_dir).localCheckpoint(
        eager=False
    )
    mom = scores.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("mean_logp").cast("decimal(18,6)"))
        .cast("double")
        .alias("s1"),
        F.sum(
            (F.col("mean_logp") * F.col("mean_logp")).cast(
                "decimal(38,12)"
            )
        )
        .cast("double")
        .alias("s2"),
    )
    mu = F.col("s1") / F.col("n")
    sigma = F.sqrt(F.col("s2") / F.col("n") - mu * mu)
    return scores.crossJoin(F.broadcast(mom)).select(
        "doc_id",
        "n_tokens",
        "mean_logp",
        F.round((F.col("mean_logp") - mu) / sigma, 6).alias(
            "lm_zscore"
        ),
    )

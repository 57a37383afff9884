"""Text-analysis operators for large-scale training-data pipelines:
tokenization, language ID, quality scoring, token counting, document
fingerprinting (BASELINE.json north-star additions; no reference
counterpart — the reference is numeric-telemetry only).

All pure Column expressions over `pyspark.sql.functions` — JVM-side,
codegen'd, no Python UDFs — so a 100 TB documents table runs at scan
speed. The module exposes the *same* token/stopword definitions the
oracle SQL uses (plans build their DuckDB SQL from these constants),
keeping Spark and oracle semantics single-sourced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tokenization contract (shared with oracle SQL): lowercase, collapse
# non-alphanumerics to single spaces, split on spaces, drop empties.
TOKEN_NORM_REGEX = "[^a-z0-9]+"

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small & deterministic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"],
    "es": ["el", "la", "los", "las", "y", "es", "de", "que", "un", "en"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "du", "que"],
}
LANG_PRIORITY = ["en", "de", "es", "fr"]


def tokens(text: Column | str) -> Column:
    """Normalized token array."""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.trim(F.regexp_replace(F.lower(c), TOKEN_NORM_REGEX, " "))
    return F.filter(F.split(norm, " "), lambda x: x != "")


def token_count(text: Column | str) -> Column:
    """Whitespace/regex token count (BPE-ish proxy for LLM token
    budgeting: ~1 token per word at this granularity)."""
    return F.size(tokens(text))


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text)))


# GPT-2-style pre-tokenizer pattern: contractions, letter runs, digit
# runs, punctuation runs, residual whitespace. Each match approximates
# one-to-a-few BPE tokens — a far better LLM-budget proxy than
# whitespace words (digits and punctuation tokenize separately).
# Kept to syntax RE2 (DuckDB) and java.util.regex (Spark) both accept.
BPE_ISH_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish token count: number of GPT-2-pattern pre-token matches
    (SURVEY/BASELINE 'token counting: whitespace + a BPE-ish regex')."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def stopword_hits(toks: Column, lang: str) -> Column:
    """Number of tokens (with repeats) in ``lang``'s stopword set."""
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))


def language_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-ratio scores (hits / total tokens)."""
    toks = tokens(text)
    n = F.size(toks)
    return {
        lang: F.when(n > 0, stopword_hits(toks, lang) / n).otherwise(0.0)
        for lang in LANG_PRIORITY
    }


def language_guess(text: Column | str) -> Column:
    """Argmax language by stopword ratio, ties broken by LANG_PRIORITY
    order (deterministic).

    r14 optimization (guide §1.2 step 2): compares integer stopword
    HIT COUNTS instead of hit/total ratios — the shared positive
    divisor (token count) cannot flip any ``>=`` comparison, and at
    zero tokens every ratio was 0.0 so the priority language won
    exactly as the all-zero-hits comparison does now: the argmax is
    IDENTICAL for every input. The win: the ratio form divided inside
    every CASE branch, which blocked whole-stage-codegen's
    subexpression elimination (branch-local subtrees are exempt), so
    the tokenizer re-ran per branch (~12 evaluations/row inside
    e2e_crawl's gate stage); the hit counts all appear in the FIRST
    branch condition — the one codegen always evaluates — so the
    token array is computed once and shared."""
    toks = tokens(text)
    # coalesce: NULL text gives NULL hit counts, whose comparisons
    # are all NULL and would fall through to the LAST priority
    # language — the ratio form scored NULL text 0.0 everywhere and
    # returned the FIRST (en). Zero hits reproduces that exactly.
    hits = {
        lang: F.coalesce(stopword_hits(toks, lang), F.lit(0))
        for lang in LANG_PRIORITY
    }
    expr = F.lit(LANG_PRIORITY[-1])
    # build reverse CASE chain: en wins ties, then de, then es, then fr
    for i in range(len(LANG_PRIORITY) - 2, -1, -1):
        lang = LANG_PRIORITY[i]
        cond = None
        for other in LANG_PRIORITY[i + 1 :]:
            c = hits[lang] >= hits[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Quality-scoring features: length, token stats, mean word length,
    alpha ratio, stopword ratio, plus a composite [0,1] quality score.
    Mirrors the length/punct/stopword heuristics used by LLM data
    pipelines (e.g. C4/Gopher-style rules), as single-pass expressions.

    r14 optimization: tokenizes ONCE into a column — the ratio
    features' when-branches are exempt from codegen subexpression
    elimination, so an inlined tokens(text) re-ran the tokenizer per
    feature (guide §1.2 step 2). Values identical.
    """
    df = df.withColumn("__toks", tokens(F.col(text_col)))
    t = F.col("__toks")
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(t)
    n_distinct = F.size(F.array_distinct(t))
    alpha_chars = F.length(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", "")
    )
    sw_en = stopword_hits(t, "en")
    mean_word_len = F.when(
        n_tokens > 0,
        (
            F.aggregate(
                t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
            )
            / n_tokens
        ),
    ).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, sw_en / n_tokens).otherwise(0.0)
    distinct_ratio = F.when(n_tokens > 0, n_distinct / n_tokens).otherwise(
        0.0
    )
    alpha_ratio = F.when(n_chars > 0, alpha_chars / n_chars).otherwise(0.0)
    len_ok = F.when((n_tokens >= 10) & (n_tokens <= 100000), 1.0).otherwise(
        0.0
    )
    wordlen_ok = F.when(
        (mean_word_len >= 2.0) & (mean_word_len <= 12.0), 1.0
    ).otherwise(0.0)
    score = (
        0.3 * len_ok
        + 0.2 * wordlen_ok
        + 0.2 * alpha_ratio
        + 0.15 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.15 * distinct_ratio
    )
    return df.select(
        "*",
        n_chars.alias("n_chars_q"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        mean_word_len.alias("mean_word_len"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stopword_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        score.alias("quality_score"),
    ).drop("__toks")


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the sorted distinct
    token bag. Two documents with the same vocabulary (any order /
    multiplicity) collide — the classic bag-fingerprint for shuffled
    near-dups; cheap (one expression) and exactly reproducible in SQL.
    """
    return F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text))))
    )


ROLL_B = (1 << 20) - 3
ROLL_P = (1 << 40) - 87


def rolling_fingerprint(
    text: Column | str, hash_impl: str = "xxhash64"
) -> Column:
    """Order-SENSITIVE document fingerprint: Rabin-Karp-style polynomial
    rolling hash over the token-hash stream, ``acc = acc*B + h (mod P)``
    — distinguishes reorderings that the bag :func:`fingerprint`
    collapses. ``F.aggregate`` with a lambda touching only its own
    accumulator/element (the safe HOF pattern; see shingles()).

    Token hashes come from ``base_hash32``: xxhash64-folded in
    production (t8: rows-only check + unit tests), md5-derived under
    ``hash_impl='md5'`` (t8p: full DuckDB hash-parity oracle via
    list_reduce over the same polynomial).
    """
    from garmin_data_pipeline_spark.operators.dedup_scale import (
        base_hash32,
    )

    c = F.col(text) if isinstance(text, str) else text
    # ANSI-safe bounds: acc < P ~ 2^40, B < 2^20, h < 2^32, so
    # acc*B + h < 2^61 — no 64-bit overflow.
    th = F.transform(tokens(c), lambda t: base_hash32(t, hash_impl))
    return F.aggregate(
        th,
        F.lit(0).cast("long"),
        lambda acc, h: F.pmod(acc * ROLL_B + h, F.lit(ROLL_P)),
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a TEXT column (tokenizes
    first; see :func:`shingles_from_tokens` when the caller already
    has the token array — tokenizing once and deriving every feature
    from the array is the r14 fast path)."""
    return shingles_from_tokens(tokens(text), n)


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles over a token-array column.

    Built by zipping n shifted slices of the token array rather than a
    ``transform`` whose lambda indexes into the outer array: correlated
    outer expressions inside an interpreted higher-order function are
    re-evaluated PER ELEMENT (the tokenizer regex would run
    #tokens x #shingles times); ``zip_with`` lambdas touch only their
    own variables, so each slice is computed once per row. ~4x faster
    on real documents, byte-identical output.
    """
    from functools import reduce

    # NULL tokens == empty tokens == zero shingles (both engines).
    t = F.coalesce(toks, F.array().cast("array<string>"))
    length = F.greatest(F.size(t) - n + 1, F.lit(0))
    parts = [F.slice(t, i + 1, length) for i in range(n)]
    joined = reduce(
        lambda acc, p: F.zip_with(
            acc, p, lambda a, b: F.concat(a, F.lit(" "), b)
        ),
        parts[1:],
        parts[0],
    )
    # Zero-token docs get ZERO shingles (not ['']): an empty-string
    # shingle would bucket every empty/whitespace doc together in the
    # Jaccard/MinHash self-joins — and the SQL mirror agrees (the
    # testdata never hits this, but a real corpus has empty docs).
    return F.array_distinct(
        F.when(F.size(t) >= n, joined)
        .when(F.size(t) == 0, F.array().cast("array<string>"))
        .otherwise(F.array(F.concat_ws(" ", t))),
    )


# ---- Oracle-SQL mirrors (DuckDB) built from the same constants ----

def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-length preprocessing step of an LLM training pipeline
    (long doc -> chunk_tokens-sized windows sharing ``overlap`` tokens
    so no boundary context is lost).

    Semantics: chunk starts are 0, stride, 2*stride, ... (stride =
    chunk_tokens - overlap), emitted only while the chunk still
    contributes at least one NEW token (start < n_tokens - overlap;
    a doc with <= overlap tokens still yields its single chunk).
    Every token is covered, no chunk is fully redundant, and
    empty/whitespace/NULL docs yield zero chunks (the
    :func:`tokens`/:func:`sql_tokens` contract).

    Scale shape: tokenize, generate starts (``explode(sequence)``),
    slice and re-join — all JVM array ops on the row. The plan is
    NARROW: zero shuffles at any corpus size, fan-out bounded by
    ceil(n/stride) rows per document.
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("chunk_tokens must exceed overlap")
    base = (
        df.select(F.col(id_col), tokens(text_col).alias("__toks"))
        .withColumn("__n", F.size("__toks"))
        .filter(F.col("__n") > 0)
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("__n") - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    chunk = F.slice(
        F.col("__toks"), F.col("__start") + 1, chunk_tokens
    )
    return (
        base.withColumn("__start", F.explode(starts))
        .select(
            F.col(id_col),
            F.floor(F.col("__start") / stride)
            .cast("int")
            .alias("chunk_index"),
            F.size(chunk).cast("int").alias("n_tokens"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
    )


# PII scrub contract (shared with oracle SQL): pattern text is the
# common Java-regex / RE2 subset so Spark and DuckDB match identically;
# applied in this dict order (insertion-ordered) so replacements are
# deterministic when categories could interact.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "[EMAIL]"),
    "phone": (r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "[PHONE]"),
    "ssn": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, tuple[str, str]] = PII_PATTERNS,
) -> DataFrame:
    """Scrub PII-shaped spans from a text column — the compliance pass
    of a training-data pipeline. Adds one ``n_<category>`` count per
    pattern (matches BEFORE redaction) and a ``redacted`` column with
    every match replaced by its placeholder, categories applied in
    dict order. Pure Column expressions (regexp_count /
    regexp_replace): JVM-side, codegen'd, zero shuffles."""
    out = df
    red = F.col(text_col)
    for cat, (pat, repl) in patterns.items():
        out = out.withColumn(
            f"n_{cat}", F.regexp_count(F.col(text_col), F.lit(pat))
        )
        red = F.regexp_replace(red, pat, repl.replace("$", r"\$"))
    return out.withColumn("redacted", red)


def sql_redact_pii(
    text_expr: str,
    patterns: dict[str, tuple[str, str]] = PII_PATTERNS,
) -> tuple[list[str], str]:
    """DuckDB mirror of :func:`redact_pii`: (count projections,
    redacted-text expression) built from the same pattern table."""
    counts = [
        f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS INT)"
        f" AS n_{cat}"
        for cat, (pat, _) in patterns.items()
    ]
    red = text_expr
    for _, (pat, repl) in patterns.items():
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return counts, f"{red} AS redacted"


def sql_chunk_documents(
    chunk_tokens: int = 32, overlap: int = 8, text_expr: str = "text"
) -> str:
    """DuckDB mirror of :func:`chunk_documents` (same starts, same
    slices, same normalization via :func:`sql_tokens`)."""
    stride = chunk_tokens - overlap
    return f"""
    WITH __t AS (
        SELECT doc_id, {sql_tokens(text_expr)} AS toks FROM documents
    ), __nz AS (
        SELECT doc_id, toks, len(toks) AS n FROM __t WHERE len(toks) > 0
    ), __s AS (
        SELECT doc_id, toks,
               unnest(range(0, greatest(n - {overlap}, 1), {stride}))
                   AS start
        FROM __nz
    )
    SELECT doc_id,
           CAST(start // {stride} AS INT) AS chunk_index,
           CAST(len(list_slice(toks, start + 1, start + {chunk_tokens}))
                AS INT) AS n_tokens,
           array_to_string(
               list_slice(toks, start + 1, start + {chunk_tokens}), ' ')
               AS chunk_text
    FROM __s
    """


def sql_tokens(text_expr: str) -> str:
    return (
        "list_filter(string_split(trim(regexp_replace(lower("
        f"{text_expr}), '{TOKEN_NORM_REGEX}', ' ', 'g')), ' '), "
        "x -> x <> '')"
    )


def sql_stopword_hits(tokens_expr: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return (
        f"len(list_filter({tokens_expr}, "
        f"x -> list_contains([{words}], x)))"
    )


def sql_positional_windows(tokens_expr: str, k: int) -> str:
    """DuckDB mirror of ``dedup_scale.positional_windows`` (md5'd):
    list whose i-th element is md5 of the space-joined k-token window
    starting at token i; < k tokens -> empty list. Pairs with a
    parallel ``generate_series`` UNNEST for the positions (DuckDB
    zips parallel UNNESTs element-wise)."""
    e = f"COALESCE({tokens_expr}, [])"
    return (
        f"CASE WHEN len({e}) >= {k} THEN "
        f"list_transform(generate_series(1, len({e}) - {k} + 1), "
        f"i -> md5(array_to_string(list_slice({e}, i, i + {k} - 1), "
        f"' '))) ELSE CAST([] AS VARCHAR[]) END"
    )


def sql_shingles(tokens_expr: str, n: int = 3) -> str:
    e = f"COALESCE({tokens_expr}, [])"  # NULL text == zero shingles
    if n == 1:
        return f"list_distinct({e})"
    return (
        f"list_distinct(CASE WHEN len({e}) >= {n} THEN "
        f"list_transform(generate_series(1, len({e}) - {n} + 1), "
        f"i -> array_to_string(list_slice({e}, i, i + {n} - 1), ' ')) "
        f"WHEN len({e}) = 0 THEN [] "
        f"ELSE [array_to_string({e}, ' ')] END)"
    )


# ---------------------------------------------------------------------------
# TF-IDF doc-term matrix (text analysis: term weighting for retrieval /
# quality features; no reference counterpart — the reference corpus is
# numeric telemetry).
# ---------------------------------------------------------------------------
def tfidf_matrix(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-(doc, token) TF-IDF: ``tf * ln(n_docs / df)``.

    Scale shape: explode -> map-side-partial count for tf, a second
    partial count over tf for df (one row per distinct (doc, token),
    so df == document frequency), then a token-keyed join. The df side
    is vocabulary-sized; AQE broadcasts it at small SFs and falls back
    to a shuffle join (with skew splitting for stop-token keys) when a
    100 TB corpus pushes the vocabulary past the broadcast threshold.
    The 1-row corpus count is broadcast.

    Float discipline: tf/df/n_docs are exact BIGINTs and ``ln`` of
    their ratio is computed once per row on both engines; the product
    is rounded to 6 dp so a <=1-ulp libm difference between JVM and
    C++ ``log`` cannot flip the value hash.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    # tf feeds both the df aggregate and the scoring join; lazy
    # checkpoint so the explode + first aggregate run once, not per
    # branch (same discipline as the Jaccard pair generator).
    tf = (
        toks.groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_counts = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(df_counts, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """One BPE-training merge step: corpus-wide counts of adjacent
    character pairs inside tokens, top-``k``.

    This is the inner loop of byte-pair-encoding tokenizer training
    distributed as explode -> hash aggregate with map-side partials ->
    ``TakeOrderedAndProject`` (no global sort). Counting character
    bigrams of every token *instance* weights pairs by token frequency
    exactly as sequential BPE does. All-integer output: hash-stable.
    """
    toks = docs.select(
        F.explode(tokens(F.col(text_col))).alias("token")
    ).filter(F.length("token") >= 2)
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("token") - 1),
                lambda i: F.col("token").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.col("pair"))
        .limit(k)
    )

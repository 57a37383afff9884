"""Iterative BPE: train K merges AND encode under the trained vocab
(VERDICT r11 directive 4 — ``t18_bpe_pairs`` computes one merge step;
this module loops it into a trainer and adds the apply-the-merges
encoder, so the pipeline can produce model-ready tokenizations with
its own vocabulary, not just profile token counts).

Algorithm (Sennrich et al. 2016, the standard corpus-BPE recipe):
pre-tokenize into words, represent each word as a symbol sequence
(initially characters), then K times: count adjacent symbol pairs
weighted by word frequency, merge the most frequent pair everywhere.
Encoding applies the K merges in training order to new text.

Relational shape — the part that matters at 100 TB:

* ONE corpus-sized aggregate (the word count). Every training
  iteration then touches only the DISTINCT-WORD relation (vocabulary-
  sized — millions of rows against a 100 TB corpus) weighted by the
  counts: pair explode → one hash aggregate → a 1-ROW argmax
  broadcast → row-local merge application. No corpus pass per
  iteration — the textbook reason corpus-BPE trains on word counts.
* The encoder is K chained 1-row broadcast joins + row-local string
  replaces: zero shuffles, embarrassingly parallel.

Determinism contract (what makes the unrolled-CTE oracle possible,
the g1 recipe): counts are exact integers; the argmax tie-break is
total (count DESC, left ASC, right ASC over ASCII strings); and the
merge application is expressed as plain ``replace`` over a
token-boundary string encoding — ``|tok1||tok2||tok3|`` — where the
pattern ``|l||r|`` can only match whole adjacent symbols (the ``|``
anchors both token starts and ends) and both engines' ``replace``
share left-to-right non-overlapping semantics, which is exactly BPE's
greedy-left merge order. Symbols are ``[a-z]+`` so the ``|`` and the
word separator ``#`` can never occur inside a token.

What we don't do: an end-of-word marker (</w>) and byte-level
fallback — stated, not fudged; both are mechanical extensions of the
same state encoding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_PATTERN = "[a-z]+"


def _initial_state(word: Column) -> Column:
    """``cat`` → ``|c||a||t|`` — every character its own symbol."""
    return F.concat(
        F.lit("|"),
        F.array_join(
            F.regexp_extract_all(word, F.lit("[a-z]"), 0), "||"
        ),
        F.lit("|"),
    )


def _adjacent_pairs(state_df: DataFrame, weight: str) -> DataFrame:
    """Explode a state relation into weighted adjacent symbol pairs."""
    toks = F.split(
        F.expr("substring(state, 2, length(state) - 2)"), r"\|\|"
    )
    sz = F.size(toks)
    pr = F.explode(
        F.arrays_zip(
            F.slice(toks, 1, sz - 1).alias("l"),
            F.slice(toks, 2, sz - 1).alias("r"),
        )
    ).alias("pr")
    return (
        state_df.select(F.col(weight), pr)
        .select(weight, F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
        .groupBy("l", "r")
        .agg(F.sum(weight).alias("c"))
    )


def _apply_merge(df: DataFrame, merge_one_row: DataFrame) -> DataFrame:
    """Apply one (l, r) merge to every ``state`` — a 1-row broadcast
    left join (empty merge table = no-op, so training never dies on a
    corpus that runs out of pairs) + a row-local replace."""
    m = merge_one_row.select(
        F.col("l").alias("__m_l"), F.col("r").alias("__m_r")
    )
    pattern = F.concat(
        F.lit("|"), F.col("__m_l"), F.lit("||"), F.col("__m_r"), F.lit("|")
    )
    merged = F.concat(
        F.lit("|"), F.col("__m_l"), F.col("__m_r"), F.lit("|")
    )
    return (
        df.join(F.broadcast(m), F.lit(True), "left")
        .withColumn(
            "state",
            F.when(F.col("__m_l").isNull(), F.col("state")).otherwise(
                F.replace(F.col("state"), pattern, merged)
            ),
        )
        .drop("__m_l", "__m_r")
    )


def bpe_train(
    df: DataFrame, text_col: str, k: int
) -> tuple[list[DataFrame], DataFrame]:
    """Train ``k`` BPE merges on a corpus.

    Returns ``(merge_steps, word_states)``: ``merge_steps`` is the
    ordered list of 1-row (l, r) DataFrames (the trained vocab, to be
    applied in order), ``word_states`` the final per-word
    tokenization with counts (useful for vocab inspection).
    """
    words = (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                    F.lit(WORD_PATTERN),
                    0,
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    states = words.select(
        "word", "cnt", _initial_state(F.col("word")).alias("state")
    )
    merges: list[DataFrame] = []
    for _ in range(k):
        pairs = _adjacent_pairs(states, "cnt")
        # localCheckpoint(eager): MATERIALIZE the 1-row argmax and cut
        # its lineage. Without this, merge i embeds the full training
        # prefix and states(i+1) = join(states(i), merge(i)) doubles
        # the plan per round — the final K=8 plan re-derived the word
        # aggregate 2^K times (256 scans, ~1 MB plan; caught in the
        # r12 review). With it, training runs K tiny jobs (the loop
        # is action-driven anyway, like pyspark.ml's fit) and both
        # the per-round state plan and the encoder stay LINEAR in K —
        # making the module's one-corpus-aggregate claim actually
        # true. Same device as the v9r shortlist checkpoint.
        best = (
            pairs.orderBy(F.desc("c"), "l", "r")
            .limit(1)
            .select("l", "r")
            .localCheckpoint(eager=True)
        )
        merges.append(best)
        states = _apply_merge(states, best)
    return merges, states


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[DataFrame],
) -> DataFrame:
    """Encode documents under a trained merge list: per-doc state
    string (words boundary-encoded, ``#``-separated so merges never
    cross words) with every merge applied in training order, plus the
    exact token count. Zero shuffles — K 1-row broadcasts and
    row-local expressions."""
    doc_state = F.array_join(
        F.transform(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                F.lit(WORD_PATTERN),
                0,
            ),
            _initial_state,
        ),
        "#",
    )
    out = df.select(F.col(id_col), doc_state.alias("state"))
    for m in merges:
        out = _apply_merge(out, m)
    # every token contributes exactly two '|' (its own boundaries)
    n_tokens = F.expr(
        "(length(state) - length(replace(state, '|', ''))) div 2"
    )
    # Model-ready token IDS under the trained vocab, still zero
    # shuffle: every token is pipe-delimited, so whole-token
    # replaces can map tokens to numeric ids with no explode/join.
    # Vocabulary ids are the standard merge-order assignment: chars
    # a..z take 0..25 (26 static replaces), merge i takes 25+i (K
    # broadcast replaces). Alpha patterns can never match inside an
    # already-numeric id, and the |tok| boundaries mean replace
    # order is irrelevant. Output: ','-joined ids within a word,
    # ';' between words — scalar, deterministic, oracle-mirrorable.
    # COLLISION RULE (ADVICE r12): ids are keyed by token STRING, so
    # if two distinct merges produce the same surface string — e.g.
    # (a,bc) and (ab,c) both yielding 'abc' — every occurrence maps
    # to the EARLIEST such merge's id (its replace runs first and the
    # numeric form can't re-match). This matches standard BPE
    # vocabularies, which are string-keyed (a duplicate surface form
    # is one vocab entry; later duplicate merges add no new id) —
    # token_ids identify vocab entries, not which merge produced a
    # given occurrence. Deterministic, and the oracle mirrors it.
    ids = F.col("state")
    for i, m in enumerate(merges):
        mm = m.select(
            F.col("l").alias("__m_l"), F.col("r").alias("__m_r")
        )
        out = out.join(F.broadcast(mm), F.lit(True), "left")
        pattern = F.concat(
            F.lit("|"), F.col("__m_l"), F.col("__m_r"), F.lit("|")
        )
        ids = F.when(F.col("__m_l").isNull(), ids).otherwise(
            F.replace(ids, pattern, F.lit(f"|{26 + i}|"))
        )
        out = out.withColumn("__ids", ids).drop("__m_l", "__m_r")
        ids = F.col("__ids")
    for c in "abcdefghijklmnopqrstuvwxyz":
        ids = F.replace(
            ids, F.lit(f"|{c}|"), F.lit(f"|{ord(c) - 97}|")
        )
    ids_str = F.replace(
        F.replace(
            F.expr(
                "CASE WHEN length(__ids_done) >= 2 THEN "
                "substring(__ids_done, 2, length(__ids_done) - 2) "
                "ELSE '' END"
            ),
            F.lit("||"),
            F.lit(","),
        ),
        F.lit("|#|"),
        F.lit(";"),
    )
    return out.withColumn("__ids_done", ids).select(
        id_col,
        n_tokens.cast("bigint").alias("n_tokens"),
        F.col("state"),
        ids_str.alias("token_ids"),
    )

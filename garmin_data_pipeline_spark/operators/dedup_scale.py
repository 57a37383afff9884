"""Deduplication operators for training-data pipelines at 100 TB:
exact (hash groupBy), word-shingle n-gram Jaccard, MinHash + LSH
banding, SimHash (BASELINE.json north-star additions).

Scale design:
- **Exact**: md5 of normalized text -> one hash-aggregate shuffle.
  Map-side partial aggregation makes this scan-bound.
- **n-gram Jaccard**: exact pairwise similarity via shingle inverted
  index (explode -> self-join on shingle -> count intersections). The
  self-join explodes on high-document-frequency shingles, so a
  ``max_df`` cap drops stop-shingles first (standard trick); for
  web-scale use MinHash below instead — this is the verifier.
- **MinHash+LSH**: k hash functions simulated as (a_i * h + b_i) mod p
  over one 64-bit base hash per shingle (Broder-style), banded so only
  same-bucket docs are joined: shuffle cost O(docs * bands), never
  O(docs^2).
- **SimHash**: 64-bit signature via per-bit weighted sums of token
  hashes; near-dup candidates = docs sharing any 16-bit chunk
  (Hamming<=3 guarantee within 4 chunks by pigeonhole).

Everything is DataFrame ops (explode / groupBy / join) — no Python in
the hot path; xxhash64 is Spark's built-in 64-bit hash.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from garmin_data_pipeline_spark.operators.text import shingles, tokens

# Mersenne prime 2^61-1: universal-hash modulus for MinHash permutations.
_MERSENNE_P = (1 << 61) - 1

# Signature relations persisted by the LSH operators, so a long-lived
# session (the driver/bench loop) doesn't accumulate cached blocks:
# the registry is a bounded FIFO — building a new LSH plan evicts the
# OLDEST cache once more than _MAX_LIVE_SIGNATURES are live.
#
# Operator-level contract: at most _MAX_LIVE_SIGNATURES live LSH
# plans at a time. The bound of 2 covers the realistic interleaving
# (build plan A, build plan B, run both — e.g. a MinHash and a
# SimHash pass over the same corpus) that the r4 one-live-plan rule
# silently de-cached; past the bound the evicted plan's self-join
# recomputes its signatures on both sides (correctness unaffected:
# the hashes are deterministic; the cost is perf only). Callers that
# want more live at once should persist/unpersist themselves.
_SIG_LOCK = threading.Lock()
_LIVE_SIGNATURES: list[DataFrame] = []
_MAX_LIVE_SIGNATURES = 2


def _persist_signature(sig: DataFrame) -> DataFrame:
    """Persist a signature DataFrame, evicting the oldest cached
    signature past the bound (see FIFO contract above). Every eviction
    is logged (ADVICE r5): a caller that builds 3+ LSH plans before
    running any silently de-caches the first plan — perf-only, but
    now observable when it bites a multi-plan caller."""
    with _SIG_LOCK:
        while len(_LIVE_SIGNATURES) >= _MAX_LIVE_SIGNATURES:
            _LIVE_SIGNATURES.pop(0).unpersist()
            import logging

            logging.getLogger(__name__).debug(
                "evicted oldest LSH signature cache (bound %d); if that "
                "plan was never run, its self-join will recompute "
                "signatures on both sides",
                _MAX_LIVE_SIGNATURES,
            )
        _LIVE_SIGNATURES.append(sig.persist())
    return sig


def unpersist_signatures() -> None:
    """Release every signature cached by the LSH operators."""
    with _SIG_LOCK:
        while _LIVE_SIGNATURES:
            _LIVE_SIGNATURES.pop().unpersist()


def base_hash32(col, hash_impl: str = "xxhash64"):
    """Non-negative 32-bit base hash of a string column.

    ``xxhash64`` (default): Spark's built-in 64-bit hash folded to 32
    bits — the production path (fast, JVM-native), but not reproducible
    outside Spark. ``md5``: first 8 hex chars of md5 parsed as an
    integer — ~20% slower, but md5 is standardized, so a DuckDB oracle
    (``('0x' || substr(md5(x),1,8))::BIGINT``) reproduces it exactly;
    the d3p/d4p/t8p parity queries run the same operators under this
    impl to hash-match the otherwise rows-only xxhash64 family."""
    c = F.col(col) if isinstance(col, str) else col
    if hash_impl == "xxhash64":
        # pmod, not abs: abs(MIN_LONG) throws under ANSI.
        return F.pmod(F.xxhash64(c), F.lit(1 << 32).cast("long"))
    if hash_impl == "md5":
        return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")
    raise ValueError(f"unknown hash_impl: {hash_impl!r}")


def sql_base_hash32(expr: str) -> str:
    """DuckDB mirror of ``base_hash32(..., hash_impl='md5')``."""
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def normalize_text(col):
    """Normalization for exact dedup: lowercase + collapse whitespace.

    The whitespace class is written out as RE2's ``\\s`` ([ \\t\\n\\r\\f])
    rather than Java's ``\\s`` (which also includes VT, 0x0B): the
    DuckDB oracles collapse with RE2 semantics, so a VT in the corpus
    would otherwise hash differently per engine (found in the r12
    review auditing e2e_crawl's dedup stage against the s15 kernel's
    pinned VT-preserving normalization).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[ \t\n\r\f]+", " "))


def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact-duplicate groups: one row per distinct normalized text,
    with the canonical (min) id and the duplicate count. A plain
    hash-aggregate: the canonical way to drop exact dups at any scale.
    """
    return (
        df.select(
            F.md5(normalize_text(text_col)).alias("text_hash"),
            F.col(id_col),
        )
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (id_a < id_b, jaccard >=
    threshold) via a shingle inverted index.

    ``max_df`` drops shingles appearing in more than that many docs
    before the self-join (skew guard — a shingle in 1M docs would
    produce 10^12 join rows). Exact only when max_df is None.
    """
    # Lazy checkpoint: the exploded shingle table feeds FOUR plan
    # branches (doc sizes, the max_df filter aggregate, and both sides
    # of the inverted-index self-join); without materialization each
    # branch re-runs the scan + tokenize + shingle explode. Lazy (not
    # eager) keeps the operator's plan-construction contract — the
    # table materializes once inside the first action and every branch
    # reads the stored blocks (MEMORY_AND_DISK, spill-safe at corpus
    # scale; the stored relation is (id, shingle) — the same data the
    # join must shuffle anyway).
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    ).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    if max_df is not None:
        good = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        # join(..., "shingle") reorders columns (key first) — reselect.
        sh = sh.join(good, "shingle").select("doc", "shingle")
    a = sh.select(F.col("doc").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.toDF("doc_a", "sz_a")
    sb = sizes.toDF("doc_b", "sz_b")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "jaccard")
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT set-Jaccard pairs (id_a < id_b, jaccard >= threshold)
    via prefix filtering (Chaudhuri et al. SSJoin ICDE 2006 / Xiao et
    al. PPJoin WWW 2008) — the LOSSLESS upgrade of
    ``ngram_jaccard_pairs``'s ``max_df`` cap.

    The cap version drops stop-shingles before the self-join, which
    bounds the fan-out but silently UNDER-reports: a pair whose
    overlap lives in common shingles is lost. Prefix filtering bounds
    the fan-out with zero loss: order every document's DISTINCT
    shingles by global document frequency (rarest first, shingle text
    as tiebreak — one total order for the whole corpus) and index
    only each document's first ``|s| - ceil(t*|s|) + 1`` shingles. If
    J(A, B) >= t, then |A intersect B| >= t*max(|A|,|B|), so each
    set's intersection misses fewer shingles than its prefix is long
    — the prefixes MUST collide. Stop-shingles sit at the END of the
    frequency order and rarely enter any prefix, so the inverted
    index self-join stays rare-token-bounded at any corpus size.
    Candidates also pass the length filter (J >= t implies
    t*|A| <= |B| <= |A|/t) before exact verification against the full
    shingle sets.

    Set (not multiset) semantics: shingles are deduped per document —
    required by the prefix bound, and what MinHash estimates, so this
    is also d3's exact ground truth.

    Exactness of the bounds (ADVICE r10): the prefix length and the
    length filter are computed in INTEGER arithmetic against a
    rational ``P/Q <= threshold`` (Q = 10^9, P = floor of the
    double's exact value scaled) — never ``fl(t*sz)``, whose rounding
    can land one double ABOVE an exactly-integer product and shorten
    the prefix by one, silently breaking the lossless contract.
    Rounding the threshold DOWN can only lengthen prefixes and widen
    the length filter, so the bound stays lossless by construction
    for every representable threshold; the final ``jaccard >=
    threshold`` verification still uses the caller's exact value.
    """
    from fractions import Fraction

    from pyspark.sql import Window

    # P/Q <= threshold EXACTLY (floor against the double's own
    # rational value), so every integer-math bound below is >= the
    # true bound — candidates can only be added, never lost.
    _q = 10**9
    _fr = Fraction(*float(threshold).as_integer_ratio())
    _p = (_fr.numerator * _q) // _fr.denominator

    # The distinct shingle table feeds FIVE plan branches (sizes,
    # document frequencies, the ranked prefixes, and both sides of
    # the verification join) — lazily materialize it once (the d2
    # pattern; lazy keeps plan construction action-free).
    # shingles() is per-document DISTINCT already, so exploding gives
    # distinct (doc, shingle) rows — set semantics with no extra
    # shuffle.
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    ).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("dfq"))
    # global frequency order, rarest first; prefix length
    # p = sz - ceil(t*sz) + 1, with ceil(t*sz) >= ceil(P*sz/Q)
    # computed as exact integer division (DIV): sz*P <= 1e5 * 1e9
    # fits a BIGINT with 4 decades to spare.
    rk = F.row_number().over(
        Window.partitionBy("doc").orderBy("dfq", "shingle")
    )
    ceil_t_sz = F.expr(f"(sz * {_p}L + {_q - 1}L) DIV {_q}L")
    prefixes = (
        sh.join(dfreq, "shingle")
        .withColumn("rk", rk)
        .join(sizes, "doc")
        .filter(F.col("rk") <= F.col("sz") - ceil_t_sz + 1)
        .select("doc", "shingle", "sz")
    )
    a = prefixes.select(
        F.col("doc").alias("doc_a"), "shingle", F.col("sz").alias("sz_a")
    )
    b = prefixes.select(
        F.col("doc").alias("doc_b"), "shingle", F.col("sz").alias("sz_b")
    )
    # length filter in the same exact integer arithmetic: J >= t
    # implies sz_b >= t*sz_a >= (P/Q)*sz_a, i.e. sz_b*Q >= sz_a*P —
    # rounding t down only widens the filter (lossless direction).
    cand = (
        a.join(b, "shingle")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("sz_b") * F.lit(_q) >= F.col("sz_a") * F.lit(_p))
            & (F.col("sz_a") * F.lit(_q) >= F.col("sz_b") * F.lit(_p))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    # exact verification: intersect the candidates' full shingle sets
    ia = sh.select(F.col("doc").alias("doc_a"), "shingle")
    ib = sh.select(F.col("doc").alias("doc_b"), "shingle")
    inter = (
        cand.join(ia, "doc_a")
        .join(ib, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.toDF("doc_a", "sz_a")
    sb = sizes.toDF("doc_b", "sz_b")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """EXACT shingle-set containment pairs: every ordered (doc_sub,
    doc_super) with shingles(doc_sub) a subset of shingles(doc_super)
    — the truncation/quote/boilerplate-wrapper duplicates that
    Jaccard at any threshold misses (a 10x-longer superset drives
    Jaccard to ~0.1 while containment stays 1.0).

    Candidate completeness is a one-line proof: if B is a subset of A
    then EVERY shingle of B is in A — in particular B's globally
    RAREST one (by document frequency, shingle text as tiebreak). So
    probing ONE shingle per document (its rarest) against the full
    inverted index finds every containment pair. The probe side is
    #docs rows; per-doc fan-out is df(rarest shingle) — the MINIMUM
    over the doc's shingles, i.e. the smallest posting list the doc
    can offer (a doc composed entirely of corpus-common shingles
    degrades toward its min-df posting list; such docs are what the
    quality filters upstream exist to drop). Candidates are then
    verified exactly against the full sets, so the output is
    oracle-exact at any corpus size. Documents with zero shingles
    (empty text) have no probe row and no subset semantics here —
    the vacuous empty-set containment is deliberately not emitted.

    Set semantics: equal shingle sets are mutual containments and
    appear as BOTH ordered pairs (sz_sub == sz_super).
    """
    from pyspark.sql import Window

    # shared by sizes, dfreq, the probe, and both verification sides
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    ).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("dfq"))
    rarest = (
        sh.join(dfreq, "shingle")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc").orderBy("dfq", "shingle")
            ),
        )
        .filter(F.col("rk") == 1)
        .select(F.col("doc").alias("doc_sub"), "shingle")
    )
    cand = (
        rarest.join(
            sh.select(F.col("doc").alias("doc_super"), "shingle"),
            "shingle",
        )
        .filter(F.col("doc_sub") != F.col("doc_super"))
        .select("doc_sub", "doc_super")
    )
    # size filter before the exact verify: a subset can't be larger
    ssub = sizes.toDF("doc_sub", "sz_sub")
    ssup = sizes.toDF("doc_super", "sz_super")
    cand = (
        cand.join(ssub, "doc_sub")
        .join(ssup, "doc_super")
        .filter(F.col("sz_sub") <= F.col("sz_super"))
    )
    ia = sh.select(F.col("doc").alias("doc_sub"), "shingle")
    ib = sh.select(F.col("doc").alias("doc_super"), "shingle")
    inter = (
        cand.select("doc_sub", "doc_super")
        .join(ia, "doc_sub")
        .join(ib, ["doc_super", "shingle"])
        .groupBy("doc_sub", "doc_super")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(ssub, "doc_sub")
        .join(ssup, "doc_super")
        .filter(F.col("inter") == F.col("sz_sub"))
        .select("doc_sub", "doc_super", "sz_sub", "sz_super")
    )


def positional_windows(
    text: "F.Column | str", k: int
) -> "F.Column":
    """POSITIONAL k-token windows of ``text``: an array whose i-th
    element (1-based) is the space-joined token window starting at
    token i. Unlike ``shingles`` this keeps duplicates and order —
    position is the whole point for substring-level dedup. Built by
    zip-concatenating k shifted slices of the token array (the
    shingles() construction, minus the distinct), so the tokenizer
    runs once per row, never per element. Docs with < k tokens get
    ZERO windows (a span shorter than the window can't be detected
    at this k — both engines agree)."""
    from functools import reduce

    t = F.coalesce(tokens(text), F.array().cast("array<string>"))
    length = F.greatest(F.size(t) - k + 1, F.lit(0))
    parts = [F.slice(t, i + 1, length) for i in range(k)]
    joined = reduce(
        lambda acc, p: F.zip_with(
            acc, p, lambda a, b: F.concat(a, F.lit(" "), b)
        ),
        parts[1:],
        parts[0],
    )
    return F.when(F.size(t) >= k, joined).otherwise(
        F.array().cast("array<string>")
    )


def exact_substring_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
) -> DataFrame:
    """Substring-level EXACT dedup (the ExactSubstr class of Lee et
    al., "Deduplicating Training Data Makes Language Models Better",
    ACL 2022): per document, the maximal token spans that appear
    VERBATIM in at least one OTHER document. This is the duplication
    mode the whole document-level family provably misses — a 50-token
    license block / boilerplate header / quoted passage repeated
    inside otherwise-distinct documents is invisible to exact-hash
    dedup (d1: whole doc differs), Jaccard (d2/d8: shared shingles
    diluted below any dedup-grade threshold by the distinct bodies)
    and containment (d9: whole-set subset test). It is the dominant
    duplication mode in crawled corpora.

    Relational shape (Lee et al. use a suffix array — a shared-memory
    structure with no distributed analogue; the k-token-window
    rolling-hash formulation is the standard scalable approximation
    and detects every shared span of >= k tokens EXACTLY):

    1. tokenize once, build POSITIONAL k-token windows as pure column
       expressions, posexplode -> (doc, pos, md5(window)). One scan,
       one explode — the same cardinality as the shingle explode the
       Jaccard family already pays (#tokens per doc).
    2. duplicated window = hash present in >= 2 DISTINCT docs: one
       map-side-partial aggregate keyed by hash. No pair enumeration
       ANYWHERE — a boilerplate window shared by a million documents
       is one aggregate row (count), never 10^12 pairs, which is what
       makes this linear at 100 TB where every pairwise formulation
       dies on exactly those heavy hitters.
    3. left-semi join the hits back on hash (AQE handles the skewed
       build side; the dup-hash relation is distinct hashes only).
    4. merge adjacent hit positions into MAXIMAL spans with the
       pos - row_number() island trick over a doc-PARTITIONED window
       (the w8 SCD2 pattern): consecutive window starts p, p+1, ...
       collapse to one span [min(p), max(p) + k - 1].

    Span semantics: a shared run of L >= k tokens produces L - k + 1
    consecutive duplicated windows which merge back to exactly that
    run — start/end are token coordinates (1-based, inclusive).
    Cross-doc contract: a window repeated only WITHIN one document is
    NOT flagged (count(distinct doc) >= 2), matching the
    training-data question "does this span exist elsewhere in the
    corpus". md5 keys keep the hash engine-portable (the d1 parity
    choice); collisions are 2^-128 — the oracle gate would catch one.
    """
    from pyspark.sql import Window

    wins = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            positional_windows(F.col(text_col), k)
        ).alias("pos0", "win"),
    ).select(
        "doc",
        (F.col("pos0") + 1).alias("pos"),
        F.md5(F.col("win")).alias("h"),
    )
    # the window table feeds both the dup-hash aggregate and the
    # semi-join probe side — materialize once (the d2/d8 pattern)
    wins = wins.localCheckpoint(eager=False)
    dup = (
        wins.groupBy("h")
        .agg(F.count_distinct("doc").alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("h")
    )
    hits = wins.join(dup, "h", "left_semi")
    grp = (
        F.col("pos")
        - F.row_number().over(
            Window.partitionBy("doc").orderBy("pos")
        )
    ).alias("grp")
    return (
        hits.select("doc", "pos", grp)
        .groupBy("doc", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k - 1).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            F.col("doc").alias("doc_id"),
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("span_len"),
            "n_windows",
        )
    )


def substring_excision_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
) -> DataFrame:
    """The ACTION half of substring-level dedup (Lee et al. remove
    all-but-one occurrence of every duplicated span; d10 only
    REPORTS them): per document, the maximal token spans to EXCISE
    so that each cross-doc-duplicated k-token window keeps exactly
    ONE canonical occurrence corpus-wide — the lexicographically
    smallest (doc, pos), i.e. the earliest position in the earliest
    document.

    Same linear shape as ``exact_substring_spans`` with one change:
    the per-hash aggregate ALSO computes the canonical occurrence as
    ``min(struct(doc, pos))`` — still a single map-side-partial
    aggregate, never pair enumeration — and the join back flags
    every occurrence EXCEPT the canonical one (including later
    occurrences inside the canonical document itself: the dedup
    action is one-occurrence-globally, unlike d10's cross-doc
    reporting contract). Flagged positions merge to maximal spans
    with the same island trick.

    Excising the reported spans removes every flagged window; the
    canonical copy survives in place, so the corpus keeps exactly
    one verbatim occurrence of each duplicated >= k-token run (the
    standard rolling-window approximation of the suffix-array
    procedure)."""
    from pyspark.sql import Window

    wins = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            positional_windows(F.col(text_col), k)
        ).alias("pos0", "win"),
    ).select(
        "doc",
        (F.col("pos0") + 1).alias("pos"),
        F.md5(F.col("win")).alias("h"),
    )
    wins = wins.localCheckpoint(eager=False)
    dup = (
        wins.groupBy("h")
        .agg(
            F.count_distinct("doc").alias("ndocs"),
            F.min(F.struct("doc", "pos")).alias("canon"),
        )
        .filter(F.col("ndocs") >= 2)
        .select(
            "h",
            F.col("canon.doc").alias("cdoc"),
            F.col("canon.pos").alias("cpos"),
        )
    )
    hits = (
        wins.join(dup, "h")
        .filter(
            ~(
                (F.col("doc") == F.col("cdoc"))
                & (F.col("pos") == F.col("cpos"))
            )
        )
        .select("doc", "pos")
    )
    grp = (
        F.col("pos")
        - F.row_number().over(
            Window.partitionBy("doc").orderBy("pos")
        )
    ).alias("grp")
    return (
        hits.select("doc", "pos", grp)
        .groupBy("doc", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k - 1).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            F.col("doc").alias("doc_id"),
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("span_len"),
            "n_windows",
        )
    )


def _minhash_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the k universal-hash permutations
    (fixed small PRNG, no runtime randomness).

    Bounds chosen for ANSI-safe long arithmetic: base hashes are 32-bit
    and a < 2^30, so a*h + b < 2^62 + 2^61 — no 64-bit overflow."""
    params = []
    state = 0x9E3779B97F4A7C15
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = (state % ((1 << 30) - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = state % _MERSENNE_P
        params.append((a, b))
    return params


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_n: int = 3,
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per document: base-hash each shingle with
    xxhash64, then k = num_hashes universal-hash permutations, min per
    doc. One explode + one groupBy with k algebraic ``min`` aggregates —
    fully codegen'd, and hash aggregation is map-side partial, so the
    shuffle carries #docs rows (k longs each), not #docs x #shingles.
    (A shuffle-free ``array_min(transform(...))`` formulation was tried
    and rejected: nested higher-order functions run interpreted, ~10x
    slower than this codegen'd aggregate.)"""
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("shingle"),
    ).withColumn(
        # 32-bit non-negative base hash so the universal-hash multiply
        # can't overflow (a < 2^30, h < 2^32 -> a*h + b < 2^63).
        "h", base_hash32("shingle", hash_impl)
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % _MERSENNE_P).alias(
            f"mh_{i}"
        )
        for i, (a, b) in enumerate(_minhash_params(num_hashes))
    ]
    sig = sh.groupBy("doc").agg(*aggs)
    return sig.select(
        "doc",
        F.array(*[f"mh_{i}" for i in range(num_hashes)]).alias("signature"),
    )


def minhash_band_buckets(
    sig: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """LSH banding of a (doc, signature) relation: one (doc, band,
    bucket) row per band. Shared by the batch pair generator and the
    streaming corpus index — identical expressions, so batch pairs
    and stream-vs-corpus candidates land in the same buckets."""
    rows = num_hashes // bands

    def band_key(i: int):
        key = F.concat_ws(
            ",",
            *[
                F.element_at("signature", i * rows + j + 1).cast("string")
                for j in range(rows)
            ],
        )
        # Production: fold the band slice to a 64-bit bucket id (8-byte
        # shuffle key). Parity impl: ship the slice string itself — one
        # fewer unreproducible hash, same buckets, mirrorable in SQL.
        return F.xxhash64(key) if hash_impl == "xxhash64" else key

    return sig.select(
        "doc",
        "signature",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        band_key(i).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")


def minhash_est_jaccard(sig_a, sig_b, num_hashes: int):
    """Estimated Jaccard = fraction of agreeing minhash positions."""
    return F.size(
        F.filter(
            F.zip_with(sig_a, sig_b, lambda x, y: x == y),
            lambda m: m,
        )
    ) / F.lit(num_hashes)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding.

    Signatures are banded (bands x rows = num_hashes); docs sharing a
    band bucket become candidates (shuffle on (band, bucket-hash), not
    all-pairs); candidates are scored by estimated Jaccard = fraction
    of matching minhashes, kept at >= threshold.
    """
    # The signature relation is referenced three times (banding + two
    # pair-side re-attachments); persist so the scan+shingle+hash work
    # runs once. At cluster scale this is where you'd checkpoint the
    # signature table.
    sig = _persist_signature(
        minhash_signatures(
            df, id_col, text_col, num_hashes, shingle_n, hash_impl
        )
    )
    banded = minhash_band_buckets(sig, num_hashes, bands, hash_impl)
    # Band rows carry only the doc id: the (band, bucket) self-join and
    # the pair dedup shuffle ids, not 32-long signature arrays;
    # signatures re-attach to the (much smaller) deduped pair set.
    a = banded.select(F.col("doc").alias("doc_a"), "band", "bucket")
    b = banded.select(F.col("doc").alias("doc_b"), "band", "bucket")
    pair_ids = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    cand = pair_ids.join(
        sig.select(
            F.col("doc").alias("doc_a"), F.col("signature").alias("sig_a")
        ),
        "doc_a",
    ).join(
        sig.select(
            F.col("doc").alias("doc_b"), F.col("signature").alias("sig_b")
        ),
        "doc_b",
    )
    est = minhash_est_jaccard(F.col("sig_a"), F.col("sig_b"), num_hashes)
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def simhash_bits(hash_impl: str) -> int:
    """Signature width per hash impl: 64 for the production xxhash64,
    32 for the md5-derived parity hash (base_hash32 is 32-bit)."""
    return 64 if hash_impl == "xxhash64" else 32


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """SimHash per document (64-bit production / 32-bit md5 parity):
    per-bit majority vote over token hashes (explode -> per-bit
    conditional-sum aggregates -> bit pack)."""
    bits = simhash_bits(hash_impl)
    h = (
        F.xxhash64("token")
        if hash_impl == "xxhash64"
        else base_hash32("token", hash_impl)
    )
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    ).withColumn("h", h)
    bit_sums = tok.groupBy("doc").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    # shiftleft(1L, 63) wraps to the sign bit in the JVM (no ANSI check)
    # — exactly what bit-packing wants; a Python 1<<63 literal would
    # overflow LongType.
    one = F.lit(1).cast("long")
    packed = bit_sums.select(
        "doc",
        sum(
            [
                F.when(F.col(f"b{i}") > 0, F.shiftleft(one, i))
                .otherwise(F.lit(0).cast("long"))
                for i in range(bits)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return packed


def simhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunks: int = 4,
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """Near-dup candidates: docs whose SimHashes share at least one of
    ``chunks`` equal-width chunks (pigeonhole: catches all pairs with
    Hamming distance < chunks), with the exact Hamming distance."""
    # The signature relation feeds both sides of the self-join; persist
    # so the token explode + per-bit aggregates run once, not twice.
    sig = _persist_signature(simhash(df, id_col, text_col, hash_impl))
    width = simhash_bits(hash_impl) // chunks
    mask = (1 << width) - 1
    chunked = sig.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("cc"),
    ).select("doc", "simhash", "cc.chunk", "cc.val")
    a = chunked.select(
        F.col("doc").alias("doc_a"), F.col("simhash").alias("sh_a"),
        "chunk", "val",
    )
    b = chunked.select(
        F.col("doc").alias("doc_b"), F.col("simhash").alias("sh_b"),
        "chunk", "val",
    )
    pairs = (
        a.join(b, ["chunk", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return pairs.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).select("doc_a", "doc_b", "hamming")


def verify_edit_distance(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_dist: int | None = None,
) -> DataFrame:
    """Character-level Levenshtein verification of candidate pairs —
    the VERIFY stage after any sketch-based generator (reference
    parity: the notebooks' pandas ``drop_duplicates`` has no fuzzy
    verifier; this is the beyond-reference LLM-pipeline stage).

    ``pairs`` carries ids only; texts are re-attached here by two
    id-keyed joins so the candidate generator never shuffles full
    texts through its index join. The kernel is the built-in JVM
    ``levenshtein`` — O(len_a * len_b) per pair, which is exactly why
    it runs on O(candidates), never all pairs.

    ``max_dist`` (capped mode) keeps only pairs with
    ``edit_dist <= max_dist`` and makes the worst case cheap twice
    over:

    - ``abs(len_a - len_b)`` is a lower bound on edit distance
      (every length change costs >= 1 edit), so pairs whose length
      gap already exceeds the cap are pruned BEFORE the kernel — a
      single skewed mega-document candidate-paired with short docs
      never reaches the O(len^2) code path;
    - surviving pairs use the 3-arg banded ``levenshtein(a, b, k)``
      (O(len * k), returns -1 past the cap) instead of the full
      matrix.

    Output in capped mode is provably identical to
    ``verify_edit_distance(...).filter(edit_dist <= max_dist)``.
    """
    ta = docs.select(
        F.col(id_col).alias(a_col), F.col(text_col).alias("text_a")
    )
    tb = docs.select(
        F.col(id_col).alias(b_col), F.col(text_col).alias("text_b")
    )
    joined = pairs.join(ta, a_col).join(tb, b_col)
    if max_dist is None:
        return joined.select(
            a_col,
            b_col,
            F.levenshtein("text_a", "text_b").cast("int").alias(
                "edit_dist"
            ),
        )
    pruned = joined.filter(
        F.abs(F.length("text_a") - F.length("text_b")) <= max_dist
    )
    return (
        pruned.select(
            a_col,
            b_col,
            F.levenshtein("text_a", "text_b", max_dist)
            .cast("int")
            .alias("edit_dist"),
        )
        .filter(F.col("edit_dist") >= 0)
    )

"""Similarity search over embedding columns (``array<float>``):
brute-force cosine top-k (the exact baseline) and LSH-bucketed /
IVF-partitioned approximate variants (the scale path).

Scale design:
- **Brute force** broadcasts the (small) query set and streams the
  corpus once: cost O(corpus x queries x dim) FLOPs, no shuffle except
  the final per-query top-k (row_number over queries — tiny).
  Dot products use ``F.zip_with`` + ``F.aggregate`` — JVM expressions,
  sequential per-row summation (deterministic, oracle-reproducible).
- **Random-hyperplane LSH** hashes vectors to sign-bit buckets using a
  deterministic pseudo-random ±1 hyperplane matrix; only same-bucket
  (query, vector) pairs are scored: shuffle O(corpus), candidates a
  small fraction. Recall is tunable via n_planes (fewer bits = bigger
  buckets = higher recall).
- **IVF** (inverted file): partition the corpus by nearest of k
  centroids (pyspark.ml KMeans, fixed seed), probe only the closest
  ``n_probe`` centroid partitions per query.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _fmt_d(x) -> str:
    """A double as a Spark-SQL literal token. ``repr`` of a Python
    float is its shortest exact decimal (round-trips bit-for-bit),
    so parsing it back yields the identical double."""
    v = float(x)
    if v != v or v in (float("inf"), float("-inf")):
        raise ValueError(f"non-finite literal {x!r}")
    return repr(v) + "D"


def lit_double_array(xs) -> "F.Column":
    """``array<double>`` literal built as ONE parsed SQL expression.

    r14 optimization (guide §1.2 step 2): the idiomatic
    ``F.array(*[F.lit(x) for x in xs])`` costs one py4j round trip
    PER ELEMENT — ~100 ms per 128-double codebook — and the ANN serve
    tiers build several codebooks per call, so Python-side plan
    construction dominated their bench walls (measured: v9r spent
    ~6 s building vs ~1.5 s executing). One ``F.expr`` parse is
    ~150x cheaper and constant-folds to the IDENTICAL Literal
    (value-parity pinned in tests/test_llm_ops.py)."""
    if not xs:
        raise ValueError("empty literal array")
    return F.expr("array(" + ",".join(_fmt_d(x) for x in xs) + ")")


def lit_double_matrix(rows) -> "F.Column":
    """``array<array<double>>`` literal via ONE parsed SQL expression
    (see :func:`lit_double_array`)."""
    if not rows:
        raise ValueError("empty literal matrix")
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_fmt_d(x) for x in r) + ")"
            for r in rows
        )
        + ")"
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def as_double_array(col):
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def cosine(a, b):
    """NULL-safe cosine similarity: a zero-norm or NULL vector yields
    NULL instead of killing the job. Under ANSI mode (Spark 4 default)
    a plain ``/`` THROWS DIVIDE_BY_ZERO on the first zero vector — at
    100 TB one corrupt embedding must not fail the batch. NULL cosines
    are excluded from ranking/threshold filters downstream (oracle
    mirror: ``dot / NULLIF(norm_a * norm_b, 0)``)."""
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k by cosine per query. Query side is broadcast; the
    corpus is scanned once; ties broken by corpus id ascending."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        as_double_array(vec_col).alias("v"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        as_double_array(query_vec_col).alias("qv"),
    )
    scored = c.join(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        cosine(F.col("v"), F.col("qv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("vec_id")
    )
    return (
        scored.filter(F.col("cosine").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix (hash-derived, no RNG state).
    Exposed so oracle SQL can embed the identical literals."""
    planes = []
    state = 0x2545F4914F6CDD1D
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (
                1 << 64
            )
            row.append(1.0 if (state >> 63) else -1.0)
        planes.append(row)
    return planes


def sql_double_array(col_sql: str) -> str:
    """SQL fragment casting an array column to ``array<double>`` —
    the text mirror of :func:`as_double_array` for the SQL-built
    expression paths."""
    return f"transform({col_sql}, x -> CAST(x AS DOUBLE))"


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id for a double-array column under ``planes``.

    Stays on the ``zip_with``/``aggregate`` form deliberately: a
    flat ``get(v,0)*w0 + get(v,1)*w1 + ...`` expansion was measured
    3x SLOWER, because when the input array is itself a computed
    expression (the float->double ``transform``), projection collapse
    re-inlines that HOF into every one of the 8x64 ``get`` terms and
    CodegenFallback evaluates it per term. The aggregate form
    evaluates the array once per plane and its sequential summation
    order matches the oracle's ``list_dot_product`` bit-for-bit.

    ``vec_col`` as a STRING is treated as a SQL fragment (a bare
    column name is one) and the whole bucket expression is built as
    ONE parsed ``F.expr`` — the r14 fast construction path (~0.5 s of
    py4j per call saved; same tree, same values). Column inputs keep
    the legacy py4j construction."""
    if isinstance(vec_col, str):
        terms = ["CAST(0 AS BIGINT)"]
        for i, plane in enumerate(planes):
            arr = (
                "array(" + ",".join(_fmt_d(x) for x in plane) + ")"
            )
            dot = (
                f"aggregate(zip_with({vec_col}, {arr}, "
                "(x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"
            )
            terms.append(
                f"(CASE WHEN {dot} >= 0 THEN CAST({1 << i} AS "
                "BIGINT) ELSE CAST(0 AS BIGINT) END)"
            )
        return F.expr(" + ".join(terms))
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = lit_double_array(plane)
        d = _dot(vec_col, lit_plane)
        bucket = bucket + F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def infer_dim(df: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from the first non-null vector (one
    tiny probe job; LIMIT 1 stops the scan at the first file that has
    a row). Raises if the column is all-NULL — a silent fallback would
    degrade every LSH bucket to 0 (see :func:`cosine_topk_lsh`)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    row = df.select(F.size(c).alias("d")).filter(F.col("d") > 0).first()
    if row is None:
        raise ValueError(
            f"cannot infer embedding dim: no non-empty vectors in {vec_col!r}"
        )
    return int(row["d"])


def probe_masks(n_planes: int, radius: int) -> list[int]:
    """All XOR masks of Hamming weight <= ``radius`` over ``n_planes``
    bits, ascending (0 first = the query's own bucket). Distinct by
    construction, so a probe set never repeats a bucket."""
    return [
        m for m in range(1 << n_planes) if bin(m).count("1") <= radius
    ]


def probe_buckets(bucket, n_planes: int, radius: int = 1):
    """Multi-probe expansion of a sign-bit bucket id: the bucket itself
    plus every neighbor within Hamming distance ``radius`` (radius 1 =
    flip each bit once: n_planes+1 probes; radius 2 adds the
    C(n_planes,2) two-bit flips). Masks are distinct, so a
    bucket-keyed join yields each candidate at most once per query —
    no dedup step needed."""
    b = F.col(bucket) if isinstance(bucket, str) else bucket
    return F.array(
        *[
            b.bitwiseXOR(F.lit(m).cast("long"))
            for m in probe_masks(n_planes, radius)
        ]
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    dim: int | None = None,
    probe_hamming: int = 0,
) -> DataFrame:
    """Approximate top-k: only candidates in the query's LSH bucket are
    scored. At 100 TB the bucket join replaces the full cross product;
    recall < 1 by construction (report alongside brute force).

    ``dim`` is the embedding dimensionality the hyperplanes are drawn
    for. It MUST match the data: ``zip_with`` NULL-pads the shorter
    array, so planes longer than the vectors make every plane dot NULL
    (-> every vector lands in bucket 0 == silent brute force), while
    shorter planes ignore the vector's tail dimensions. Pass it
    explicitly for a lazy plan, or leave ``None`` to infer it from the
    corpus with one LIMIT-1 probe job at plan-construction time (an
    EAGER probe inside plan construction — prefer explicit ``dim`` at
    new call sites; the registered plans all pass it).

    ``probe_hamming`` enables multi-probe serving: each query probes
    every bucket within that Hamming distance of its own (the buckets
    its borderline hyperplane dots could have flipped into). Radius 1
    costs <= (n_planes+1)x candidates, radius 2 adds the two-bit
    flips — the standard quality/cost knob of sign-bucket LSH. The
    query side is exploded BEFORE the broadcast, so the corpus is
    still scanned once with a single bucket-equality join."""
    if dim is None:
        dim = infer_dim(corpus, vec_col)
    if probe_hamming not in (0, 1, 2):
        raise ValueError("probe_hamming must be 0, 1 or 2")
    planes = hyperplanes(n_planes, dim)
    # Norms are per-VECTOR, not per-pair: computing them before the
    # bucket join (nv once per corpus row, nq once per query) leaves
    # only the dot product in the per-candidate scoring — measured 2x
    # on the radius-2 multi-probe serve shape, where each query's
    # vector would otherwise be re-normed for every one of its ~300
    # candidates. Values are bit-identical (same _norm expression,
    # evaluated earlier).
    c = (
        corpus.select(
            F.col(id_col).alias("vec_id"),
            as_double_array(vec_col).alias("v"),
        )
        .withColumn("bucket", lsh_bucket("v", planes))
        .withColumn("nv", _norm(F.col("v")))
    )
    q = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            as_double_array(query_vec_col).alias("qv"),
        )
        .withColumn("bucket", lsh_bucket("qv", planes))
        .withColumn("nq", _norm(F.col("qv")))
    )
    if probe_hamming:
        q = q.select(
            "query_id",
            "qv",
            "nq",
            F.explode(
                probe_buckets("bucket", n_planes, probe_hamming)
            ).alias("bucket"),
        )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id",
        "vec_id",
        F.try_divide(
            _dot(F.col("v"), F.col("qv")), F.col("nv") * F.col("nq")
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("vec_id")
    )
    return (
        scored.filter(F.col("cosine").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _ivf_fit_input(
    c: DataFrame,
    sample_fraction: float | None,
    n_centroids: int,
    seed: int,
) -> DataFrame:
    """The relation KMeans fits on: a deterministic (seeded) sample of
    the corpus when ``sample_fraction`` is set, else the full corpus.

    Sampling is THE scale lever of the index build: centroid quality
    converges long before the full corpus is seen, so at 100 TB you fit
    on ~10^5-10^6 vectors and only ``transform`` (one pass, no
    iteration) the rest. Falls back to the full corpus if the sample
    is too small to support ``n_centroids`` clusters."""
    if sample_fraction is None or sample_fraction >= 1.0:
        return c
    sampled = c.sample(fraction=sample_fraction, seed=seed)
    # one cheap count vs an iterative fit on a degenerate sample
    if sampled.count() < n_centroids * 4:
        return c
    return sampled


def build_ivf_index(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Build an IVF index once: KMeans-partition the corpus, returning
    (assigned vectors with their cell, broadcastable centroid table).

    The iterative KMeans *fit* runs on a seeded sample
    (``sample_fraction``); the full corpus is only *transformed* — a
    single non-iterative pass. Persist the result with
    :func:`write_ivf_index` (partitioned by ``cell`` so probes read
    only their cells' files) and reuse it across every query batch:
    the build is the expensive part — amortize it."""
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "pyspark.ml unavailable; use cosine_topk_lsh instead"
        ) from exc

    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        as_double_array(vec_col).alias("v"),
    ).withColumn("features", array_to_vector("v"))
    fit_input = _ivf_fit_input(c, sample_fraction, n_centroids, seed)
    km = KMeans(k=n_centroids, seed=seed, featuresCol="features")
    model = km.fit(fit_input)
    # Precompute each vector's L2 norm AT BUILD TIME: serving then
    # needs one array pass (the dot product) per candidate instead of
    # three (dot + both norms) — identical IEEE ops in the same order,
    # just hoisted out of the per-query scoring loop, so results are
    # bit-identical. At 100 TB this is 1 extra double per vector in
    # the index vs ~2/3 of the serve-path FLOPs.
    assigned = model.transform(c).select(
        "vec_id",
        "v",
        F.col("prediction").alias("cell"),
        _norm(F.col("v")).alias("norm"),
    )
    centroids = [
        (i, [float(x) for x in ctr])
        for i, ctr in enumerate(model.clusterCenters())
    ]
    cent_df = corpus.sparkSession.createDataFrame(
        centroids, "cell int, centroid array<double>"
    )
    return assigned, cent_df


def write_ivf_index(
    assigned: DataFrame, centroids: DataFrame, path: str
) -> None:
    """Persist an IVF index with the physical layout probes want:
    ``assigned`` partitioned by ``cell`` (a probe of n_probe cells
    prunes to those cells' files — the parquet analog of an inverted
    file), ``centroids`` as one tiny broadcastable table."""
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/assigned"
    )
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def read_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Reopen a written IVF index: (assigned, centroids). Filtering
    ``assigned`` by cell hits parquet partition pruning (and the
    broadcast cell join in :func:`search_ivf` qualifies for dynamic
    partition pruning under AQE)."""
    return (
        spark.read.parquet(f"{path}/assigned"),
        spark.read.parquet(f"{path}/centroids"),
    )


def search_ivf(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Probe a prebuilt IVF index: rank centroids per query, score only
    the ``n_probe`` nearest cells' vectors, keep top-k by cosine.

    If ``assigned`` carries a precomputed ``norm`` column (indexes from
    :func:`build_ivf_index` / :func:`assign_cells_fixed` do), scoring
    uses it and computes only the dot product per candidate; query
    norms are likewise computed once per query before the broadcast.
    Bit-identical to the inline-norm form (same IEEE ops, same order)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        as_double_array(query_vec_col).alias("qv"),
    ).withColumn("qnorm", _norm(F.col("qv")))
    # nearest n_probe cells per query (tiny cross join vs centroids)
    qc = (
        q.join(F.broadcast(centroids))
        .select(
            "query_id",
            "qv",
            "qnorm",
            "cell",
            _dot(F.col("qv"), F.col("centroid")).alias("cdot"),
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cdot"), F.col("cell")
                )
            ),
        )
        .filter(F.col("crank") <= n_probe)
        .select("query_id", "qv", "qnorm", "cell")
    )
    corpus_norm = (
        F.col("norm") if "norm" in assigned.columns else _norm(F.col("v"))
    )
    scored = assigned.join(F.broadcast(qc), "cell").select(
        "query_id",
        "vec_id",
        F.try_divide(
            _dot(F.col("v"), F.col("qv")), corpus_norm * F.col("qnorm")
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("vec_id")
    )
    return (
        scored.filter(F.col("cosine").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 42,
    sample_fraction: float | None = None,
) -> DataFrame:
    """IVF approximate top-k in one shot (build + search); for repeated
    query batches build the index once with :func:`build_ivf_index`."""
    assigned, cent_df = build_ivf_index(
        corpus, n_centroids, id_col, vec_col, seed, sample_fraction
    )
    return search_ivf(
        assigned, cent_df, queries, k, n_probe, query_id_col, query_vec_col
    )


def grid_centroids(
    n_cells: int, dim: int, salt: int = 0
) -> list[list[float]]:
    """Deterministic pseudo-random centroids (same LCG family as
    :func:`hyperplanes`, but float-valued in [-1, 1)), rounded to 6
    decimals so oracle SQL can embed literals that parse back to
    bit-identical doubles in any engine.

    This is the coarse quantizer of the ORACLE-CHECKABLE IVF twin:
    KMeans centroids (see :func:`build_ivf_index`) give better cells
    but are not reproducible outside Spark; a fixed pseudo-random
    codebook exercises the identical probe/rerank plumbing with
    cross-engine-verifiable results.

    ``salt`` selects an independent codebook from the same family
    (:func:`assign_cells_product` needs two); ``salt=0`` reproduces
    the historical sequence bit-for-bit — the v4p/v9p oracle literals
    depend on it.
    """
    state = 0x9E3779B97F4A7C15 ^ (salt * 0xD1B54A32D192ED03 % (1 << 64))
    out = []
    for _ in range(n_cells):
        row = []
        for _ in range(dim):
            state = (
                state * 6364136223846793005 + 1442695040888963407
            ) % (1 << 64)
            row.append(round((state >> 40) / float(1 << 24) * 2.0 - 1.0, 6))
        out.append(row)
    return out


def _centroid_df(spark, centroids: list[list[float]]) -> DataFrame:
    return spark.createDataFrame(
        list(enumerate(centroids)), "cell int, centroid array<double>"
    )


def assign_cells_fixed(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization against a FIXED codebook: each vector
    goes to its max-dot-product centroid.

    Scale shape: broadcast the (tiny) centroid table, score every
    (vector, centroid) pair map-side, then collapse with a ``max_by``
    hash aggregate — partial aggregation removes the n_cells fan-out
    before the shuffle, and there is no window and no iterative fit
    anywhere. Determinism: the ordering key is
    (coalesce(dot, -inf), -cell), so dot ties break to the lowest
    cell and a NULL/corrupt vector lands in cell 0 (it is excluded
    downstream anyway by its NULL cosine).
    """
    cent_df = _centroid_df(corpus.sparkSession, centroids)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        as_double_array(vec_col).alias("v"),
    )
    scored = c.join(F.broadcast(cent_df)).select(
        "vec_id",
        "v",
        "cell",
        F.coalesce(
            _dot(F.col("v"), F.col("centroid")), F.lit(-1e300)
        ).alias("cdot"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.first("v").alias("v"),
            F.max_by(
                "cell", F.struct(F.col("cdot"), (-F.col("cell")).alias("nc"))
            ).alias("cell"),
        )
        # precomputed norm — see build_ivf_index: serve-path scoring
        # then needs only the dot product per candidate
        .withColumn("norm", _norm(F.col("v")))
    )


def assign_cells_product(
    corpus: DataFrame,
    books_a: list[list[float]],
    books_b: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product cell assignment — the inverted-multi-index idea
    (Babenko & Lempitsky, CVPR 2012) flattened to full-vector dual
    quantization: two INDEPENDENT codebooks of ~sqrt(C) centroids
    each, a vector's cell is the PAIR of its nearest centroid in
    each, giving C = |A| x |B| effective cells for |A| + |B| dot
    products per vector.

    This is the fix for the flat assignment's hidden quadratic: with
    cells sized to the corpus (C = n / occupancy),
    :func:`assign_cells_fixed` scores n x C pairs = O(n^2) — the r8
    sf1.0 probe measured exactly that (v6s still ~15x wall at 10x
    data with the flat scan). Product assignment scores
    n x 2*sqrt(C) = O(n^1.5), and the constant is what matters at
    real scale: SemDeDup's 50k cells become 2 x 224 dots/vector
    instead of 50k.

    Plan shape: ONE broadcast join against the union of both
    codebooks (tagged ``level``), one hash aggregate with a per-level
    ``max_by`` whose ordering struct puts in-level rows first —
    identical shuffle count to the flat path, only the fan-out
    shrinks. Determinism: ties break to the lowest cell per level,
    like :func:`assign_cells_fixed`."""
    spark = corpus.sparkSession
    n_b = len(books_b)
    cents = spark.createDataFrame(
        [(0, i, c) for i, c in enumerate(books_a)]
        + [(1, i, c) for i, c in enumerate(books_b)],
        "level int, cell int, centroid array<double>",
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        as_double_array(vec_col).alias("v"),
    )
    scored = c.join(F.broadcast(cents)).select(
        "vec_id",
        "v",
        "level",
        "cell",
        F.coalesce(
            _dot(F.col("v"), F.col("centroid")), F.lit(-1e300)
        ).alias("cdot"),
    )

    def pick(level: int):
        # in-level rows always outrank out-of-level rows (lv=1 > 0),
        # then best dot, then lowest cell — so the winner is a
        # genuine level-`level` row with a deterministic tie-break.
        return F.max_by(
            "cell",
            F.struct(
                (F.col("level") == F.lit(level)).cast("int").alias("lv"),
                F.col("cdot").alias("d"),
                (-F.col("cell")).alias("nc"),
            ),
        )

    return (
        scored.groupBy("vec_id")
        .agg(
            F.first("v").alias("v"),
            pick(0).alias("__a"),
            pick(1).alias("__b"),
        )
        .select(
            "vec_id",
            "v",
            (F.col("__a") * n_b + F.col("__b")).alias("cell"),
        )
        .withColumn("norm", _norm(F.col("v")))
    )


def cosine_topk_ivf_grid(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF approximate top-k with the deterministic grid codebook:
    identical probe + rerank plumbing to :func:`cosine_topk_ivf`, with
    the KMeans fit swapped for :func:`grid_centroids` so a SQL oracle
    can reproduce every step (cell assignment, probe choice, rerank)
    bit-for-bit."""
    cents = grid_centroids(n_cells, dim)
    assigned = assign_cells_fixed(corpus, cents, id_col, vec_col)
    cent_df = _centroid_df(corpus.sparkSession, cents)
    return search_ivf(
        assigned, cent_df, queries, k, n_probe, query_id_col, query_vec_col
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 256,
) -> DataFrame:
    """Per-vector min/max linear quantization of an embedding column
    to ``levels`` integer buckets (int8 when levels=256) — the 4x
    storage/bandwidth compression a 100 TB embedding store runs
    before ANN serving.

    q[i] = floor((x[i] - lo) / (hi - lo) * (levels-1)), clamped to
    levels-1; a flat vector (hi == lo) quantizes to all zeros. floor
    (not round) keeps the math bit-reproducible across engines: every
    step is the same IEEE-754 double op in the same order, and floor
    of identical doubles is identical — no round-half tie hazard.
    Output: (id, qvec array<int>, lo, hi); dequantize with
    :func:`dequantize_embeddings` (error <= (hi-lo)/(levels-1) per
    element). NULL vectors pass through with NULL qvec. Pure column
    expressions — scan-bound, no shuffle, no Python.
    """
    v0 = as_double_array(vec_col)
    scaled = F.transform(
        F.col("v"),
        lambda x: F.least(
            F.floor(
                (x - F.col("lo")) / (F.col("hi") - F.col("lo"))
                * F.lit(float(levels - 1))
            ),
            F.lit(levels - 1).cast("bigint"),
        ).cast("int"),
    )
    flat = F.transform(F.col("v"), lambda x: F.lit(0))
    return (
        df.select(
            F.col(id_col).alias("vec_id"),
            v0.alias("v"),
            F.array_min(v0).alias("lo"),
            F.array_max(v0).alias("hi"),
        )
        .select(
            "vec_id",
            F.when(F.col("hi") == F.col("lo"), flat)
            .otherwise(scaled)
            .alias("qvec"),
            "lo",
            "hi",
        )
    )


def dequantize_embeddings(
    df: DataFrame,
    qvec_col: str = "qvec",
    lo_col: str = "lo",
    hi_col: str = "hi",
    levels: int = 256,
    out_col: str = "v",
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings` (bucket midpoint-free
    lower-edge reconstruction): x' = lo + q * (hi - lo)/(levels-1)."""
    step = (F.col(hi_col) - F.col(lo_col)) / F.lit(float(levels - 1))
    return df.withColumn(
        out_col,
        F.transform(
            F.col(qvec_col), lambda q: F.col(lo_col) + q * step
        ),
    )


def build_quantized_lsh_index(
    corpus: DataFrame,
    n_planes: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN serve index over int8-quantized vectors: the downstream
    consumer of :func:`quantize_embeddings` (which alone is just a
    storage pass). Output per vector:

    - ``qvec8``: the 256-level quantized vector stored as
      ``array<tinyint>`` (values shifted by -128 to fit the signed
      byte) — 1 byte/element vs 8 for double: the 8x memory/bandwidth
      compression that lets a 100 TB embedding store serve from RAM;
    - ``lo``/``hi``: per-vector dequantization range;
    - ``bucket``: sign-bit LSH bucket (computed over the DEQUANTIZED
      values, so index-side hashing is self-consistent with the
      reconstruction the scorer sees);
    - ``norm``: L2 norm of the dequantized vector, precomputed so
      serving does one array pass per candidate (see
      :func:`search_ivf`).

    Pure column expressions, no shuffle; write partitioned/persisted
    and reuse across query batches. ``dim=None`` runs infer_dim's
    eager LIMIT-1 probe at plan-construction time — pass it
    explicitly to keep the plan lazy (registered call sites do)."""
    if dim is None:
        dim = infer_dim(corpus, vec_col)
    planes = hyperplanes(n_planes, dim)
    qt = quantize_embeddings(corpus, id_col=id_col, vec_col=vec_col)
    deq = dequantize_embeddings(qt)
    return deq.select(
        "vec_id",
        F.transform(
            F.col("qvec"), lambda q: (q - F.lit(128)).cast("tinyint")
        ).alias("qvec8"),
        "lo",
        "hi",
        lsh_bucket("v", planes).alias("bucket"),
        _norm(F.col("v")).alias("norm"),
    )


def search_quantized_lsh(
    index: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int | None = None,
    probe_hamming: int = 1,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Serve cosine top-k from a :func:`build_quantized_lsh_index`
    index: bucket-join prune (multi-probe by default — quantized
    serving exists for recall-at-low-cost, so probe the Hamming-1
    neighborhood), dequantize ONLY the candidates, score with the
    precomputed norms. The full-precision corpus is never read.
    ``dim=None`` triggers infer_dim's eager LIMIT-1 probe against the
    QUERY side — pass dim explicitly to keep plan construction lazy."""
    if dim is None:
        dim = infer_dim(queries, query_vec_col)
    planes = hyperplanes(n_planes, dim)
    q = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            as_double_array(query_vec_col).alias("qv"),
        )
        .withColumn("bucket", lsh_bucket("qv", planes))
        .withColumn("qnorm", _norm(F.col("qv")))
    )
    if probe_hamming:
        q = q.select(
            "query_id",
            "qv",
            "qnorm",
            F.explode(
                probe_buckets("bucket", n_planes, probe_hamming)
            ).alias("bucket"),
        )
    # Dequantization folded into the dot product algebraically:
    #   dot(deq(q8), qv) = sum_i (lo + (q8_i+128)*step) * qv_i
    #                    = (lo + 128*step) * sum(qv) + step * dot8
    # with dot8 = sum_i q8_i*qv_i and sum(qv) precomputed per query —
    # ONE array pass per candidate instead of two (dequantize
    # transform + dot), and the only per-pair HOF is the int8 x
    # double zip. Same reconstruction to float rounding (the serve
    # path is approximate by construction; the recall-vs-float test
    # bounds it).
    step = (F.col("hi") - F.col("lo")) / F.lit(255.0)
    q = q.withColumn(
        "qsum",
        F.aggregate(F.col("qv"), F.lit(0.0), lambda acc, x: acc + x),
    )
    dot8 = F.aggregate(
        F.zip_with(
            F.col("qvec8"),
            F.col("qv"),
            lambda x, y: x.cast("double") * y,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    deq_dot = (
        F.col("lo") + F.lit(128.0) * step
    ) * F.col("qsum") + step * dot8
    scored = index.join(F.broadcast(q), "bucket").select(
        "query_id",
        "vec_id",
        F.try_divide(
            deq_dot, F.col("norm") * F.col("qnorm")
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("vec_id")
    )
    return (
        scored.filter(F.col("cosine").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join: pairs
    in the same sign-bucket with cosine >= threshold (id_a < id_b).
    ``dim`` as in :func:`cosine_topk_lsh` — explicit keeps the plan
    lazy, ``None`` infers it with one LIMIT-1 probe."""
    if dim is None:
        dim = infer_dim(df, vec_col)
    planes = hyperplanes(n_planes, dim)
    # Per-vector norm computed BEFORE the self-join (see
    # cosine_topk_lsh): the per-pair score is then dot-only.
    v = (
        df.select(
            F.col(id_col).alias("vid"),
            as_double_array(vec_col).alias("v"),
        )
        .withColumn("bucket", lsh_bucket("v", planes))
        .withColumn("nv", _norm(F.col("v")))
    )
    a = v.select(
        F.col("vid").alias("id_a"),
        F.col("v").alias("va"),
        F.col("nv").alias("na"),
        "bucket",
    )
    b = v.select(
        F.col("vid").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nv").alias("nb"),
        "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.try_divide(
                _dot(F.col("va"), F.col("vb")),
                F.col("na") * F.col("nb"),
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the embedding space, then drop
    every vector that has a too-similar (cosine >= ``threshold``)
    cluster-mate with a smaller id; the min-id member of each similar
    group survives as its representative. Returns the survivors as
    ``(vec_id, cell)``.

    Determinism: SemDeDup proper keeps a random / lowest-distance-to-
    centroid member per group; the min-id rule here is the
    reproducible (and cross-engine oracle-checkable) tie-break, and
    the codebook is a FIXED centroid list (see :func:`grid_centroids`)
    rather than a KMeans fit for the same reason. Swapping in
    :func:`build_ivf_index` centroids gives the paper's behavior.

    Scale shape (100 TB): the self-join is bucketed by cell — the
    codebook size bounds candidate pairs at sum(|cell|^2), never
    all-pairs; one shuffle on ``cell`` for the join, one hash
    aggregate for the distinct-losers set, one shuffled anti-join
    back. THE CODEBOOK MUST GROW WITH THE CORPUS: sum(|cell|^2) is
    linear only while occupancy is bounded — a fixed codebook at 10x
    the data is 100x the pairs (measured: the r8 sf1.0 probe's 17x
    wall, sf1_probe.json). Use :func:`semantic_dedup_scaled` to size
    cells automatically (the paper runs ~50k clusters at 100M docs);
    AQE's skew-join split handles residual hot cells.
    """
    assigned = assign_cells_fixed(corpus, centroids, id_col, vec_col)
    return _semantic_dedup_assigned(assigned, threshold)


def _semantic_dedup_assigned(
    assigned: DataFrame, threshold: float
) -> DataFrame:
    """Dedup half of :func:`semantic_dedup`, factored out so any cell
    assignment (flat :func:`assign_cells_fixed`, product
    :func:`assign_cells_product`, or a trained KMeans) feeds the same
    bucketed self-join. Expects ``(vec_id, v, cell, norm)``."""
    # the assignment precomputes the per-vector norm: the per-pair
    # score inside the cell self-join is dot-only.
    a = assigned.select(
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("norm").alias("na"),
        "cell",
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
        "cell",
    )
    losers = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.try_divide(
                _dot(F.col("va"), F.col("vb")),
                F.col("na") * F.col("nb"),
            )
            >= threshold
        )
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return assigned.join(losers, "vec_id", "left_anti").select(
        "vec_id", F.col("cell").cast("int").alias("cell")
    )


def semantic_dedup_scaled(
    corpus: DataFrame,
    threshold: float = 0.3,
    target_cell_size: int = 64,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`semantic_dedup` with the codebook SIZED TO THE CORPUS —
    the scale path. The r8 sf1.0 probe caught the failure mode of a
    fixed codebook empirically: with 8 cells, 10x the vectors means
    10x the cell occupancy and 100x the self-join pairs — measured
    17x wall at 10x data (sf1_probe.json), the only super-linear
    entry in the probe set. Holding occupancy constant instead
    (n_cells = corpus / ``target_cell_size``) keeps pairs-per-cell
    bounded and total pair count LINEAR in the corpus — which is
    exactly why SemDeDup's authors run ~50k clusters at 100M docs
    (cells sized to the data, not a constant).

    Cost model: one COUNT job for the corpus size (a sanctioned
    driver-side scalar), then assignment and the self-join at
    ~n x target_cell_size. The flat assignment scan hides its OWN
    quadratic — n x n_cells = n^2 / occupancy dot products (the
    first cut of this function still probed ~15x wall at 10x data
    because of it) — so past 64 cells the assignment switches to
    :func:`assign_cells_product`: two independent ~sqrt(n_cells)
    codebooks, n x 2*sqrt(n_cells) dots, same dedup downstream."""
    n = corpus.count()
    n_cells = max(8, int(n // target_cell_size))
    if n_cells <= 64:
        cents = grid_centroids(n_cells, dim)
        return semantic_dedup(
            corpus, cents, threshold, id_col, vec_col
        )
    import math

    side = math.isqrt(n_cells - 1) + 1  # ceil(sqrt)
    assigned = assign_cells_product(
        corpus,
        grid_centroids(side, dim, salt=1),
        grid_centroids(side, dim, salt=2),
        id_col,
        vec_col,
    )
    return _semantic_dedup_assigned(assigned, threshold)


# ---------------------------------------------------------------------------
# Per-group embedding centroids (class prototypes / cluster means —
# the aggregation half of nearest-class-mean classification and the
# M-step a distributed KMeans runs; no reference counterpart).
# ---------------------------------------------------------------------------
def embedding_centroids(
    emb: DataFrame, group_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Element-wise mean of ``vec_col`` per ``group_col``, in LONG
    format ``(group, pos, mean_val, n)`` with 0-based ``pos``.

    Scale shape: posexplode (rows x dim, embarrassingly parallel) ->
    hash aggregate on (group, pos) with map-side partials — one
    shuffle of groups x dim partial sums, never the raw vectors. Long
    output keeps the plan pure-relational (downstream consumers pivot
    or collect_list only if they truly need dense vectors).

    Float discipline: partial sums accumulate in DECIMAL(18,6) (order-
    independent, hash-stable vs the oracle — see plans/registry.py),
    emitted as DOUBLE / count.
    """
    ex = emb.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    return ex.groupBy(group_col, "pos").agg(
        (
            F.sum(F.col("v").cast("double").cast("decimal(18,6)")).cast(
                "double"
            )
            / F.count("v")
        ).alias("mean_val"),
        F.count("v").alias("n"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory tier BELOW int8 — m codebook
# ids per vector instead of dim scalars (64-dim float32 = 256 B ->
# 8 B at m=8). Deterministic grid codebooks (same rationale as
# grid_centroids: a KMeans-trained codebook quantizes better but is
# not reproducible outside Spark; the fixed codebook exercises the
# identical encode/ADC plumbing with cross-engine-verifiable codes).
# ---------------------------------------------------------------------------
def pq_codebooks(
    m: int = 8, k: int = 16, subdim: int = 8, scale: float = 0.125
) -> list[list[list[float]]]:
    """``m`` per-subspace codebooks of ``k`` codewords x ``subdim``
    dims, deterministic and 6-dp-rounded so SQL literals parse back to
    bit-identical doubles in any engine.

    ``scale`` sets the codeword element range to +/- scale: unit-norm
    embeddings have elements ~ +/- 1/sqrt(dim) (0.125 at dim=64), and
    a codebook at the data's scale is what makes the quantizer lossy-
    but-useful — at scale 1.0 reconstruction is WORSE than emitting
    zero (measured 9x base MSE), at 0.125 it removes ~a third of it.
    A trained codebook replaces this choice entirely."""
    state = 0xC2B2AE3D27D4EB4F
    books = []
    for _ in range(m):
        book = []
        for _ in range(k):
            row = []
            for _ in range(subdim):
                state = (
                    state * 6364136223846793005 + 1442695040888963407
                ) % (1 << 64)
                row.append(
                    round(
                        ((state >> 40) / float(1 << 24) * 2.0 - 1.0)
                        * scale,
                        6,
                    )
                )
            book.append(row)
        books.append(book)
    return books


def fit_pq_codebooks(
    emb: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    subdim: int = 8,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> list[list[list[float]]]:
    """K-means-TRAINED per-subspace codebooks (Jégou et al., PQ):
    same ``m x k x subdim`` nested-list contract as
    :func:`pq_codebooks`, so trained books drop into ``pq_encode`` /
    ``build_pq_lsh_index`` / ``search_pq_lsh`` via their ``books``
    parameter WITHOUT changing the plan — codebooks enter the plan as
    literals either way; only the literal values differ.

    Reuses the IVF sample-fit lever (:func:`_ivf_fit_input`): the
    iterative fit runs on a seeded sample — centroid quality
    converges long before the full corpus is seen, so at 100 TB you
    fit on ~10^5 subvectors per subspace and the corpus itself is
    touched only by the (single-pass) encoder. The m fits share one
    cached sample scan; each fits ``k`` centers over ``subdim``-dim
    slices. Codewords round to 6 dp like the grid books (stable SQL
    literals on any engine)."""
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "pyspark.ml unavailable; use pq_codebooks() instead"
        ) from exc

    c = emb.filter(
        F.col(vec_col).isNotNull()
        & (F.size(vec_col) >= m * subdim)
    ).select(as_double_array(vec_col).alias("v"))
    fit_input = _ivf_fit_input(c, sample_fraction, k, seed).persist()
    try:
        books = []
        for j in range(m):
            sub = fit_input.select(
                array_to_vector(
                    F.slice("v", j * subdim + 1, subdim)
                ).alias("features")
            )
            model = KMeans(
                k=k, seed=seed + j, featuresCol="features"
            ).fit(sub)
            books.append(
                [
                    [round(float(x), 6) for x in ctr]
                    for ctr in model.clusterCenters()
                ]
            )
    finally:
        fit_input.unpersist()
    return books


def _pq_subdists_sql(
    vec_sql: str, j: int, book: list[list[float]], subdim: int
) -> str:
    """Spark-SQL text of :func:`_pq_subdists` over a SQL vector
    fragment — the same HOF tree spelled once and parsed JVM-side
    instead of assembled through hundreds of py4j calls (r14
    optimization; see :func:`lit_double_array` for the measurement)."""
    book_sql = (
        "array("
        + ",".join(
            "array(" + ",".join(_fmt_d(w) for w in cw) + ")"
            for cw in book
        )
        + ")"
    )
    return (
        f"transform({book_sql}, cw -> aggregate(zip_with("
        f"slice({vec_sql}, {j * subdim + 1}, {subdim}), cw, "
        "(a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)"
        "), 0.0D, (acc, x) -> acc + x))"
    )


def _pq_subdists(vec, j: int, book: list[list[float]], subdim: int):
    """Array of squared L2 distances from subvector j to every
    codeword of its book, via array higher-order functions. A fully
    unrolled m*k*subdim expression tree (the obvious alternative)
    exceeds Janino's method-size limit, kicks the whole projection out
    of codegen, and ran 20x slower interpreted; the HOF form keeps the
    tree O(1). The fold is left-to-right over zip order — the SAME
    association the oracle's hand-unrolled sum uses, so the doubles
    stay bit-identical (float + is not associative).

    ``vec`` may be a Column (legacy py4j construction) or a SQL
    fragment STRING — the fast path every serve tier uses: one
    ``F.expr`` parse instead of ~70 ms of py4j lambda plumbing per
    subspace (value-identical; parity pinned in tests)."""
    if isinstance(vec, str):
        return F.expr(_pq_subdists_sql(vec, j, book, subdim))
    sub = F.slice(vec, j * subdim + 1, subdim)
    book_lit = lit_double_matrix(book)
    return F.transform(
        book_lit,
        lambda cw: F.aggregate(
            F.zip_with(
                sub,
                cw,
                lambda a, b: (a.cast("double") - b)
                * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def pq_encode(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    subdim: int = 8,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Encode each vector as ``m`` codeword ids (argmin squared-L2 per
    subspace; first-occurrence tiebreak = deterministic).

    Scale shape: one scan, zero shuffle — the m x k distance lattice
    is unrolled into whole-stage-codegen arithmetic (m*k*subdim
    multiply-adds per row), and argmin is array_position(arr,
    array_min(arr)). NULL vectors encode as NULL (kept, flagged) —
    dropping rows in an encoder would silently shrink the corpus.
    """
    return emb.select(
        F.col(id_col),
        _pq_code_expr(vec_col, m, k, subdim, books).alias("pq_code"),
    )


def pack_pq_code(code_col, k: int = 16):
    """Fold an ``array<int>`` PQ code into ONE BIGINT (left fold
    ``acc*k + code`` — at m=8, k=16 that is 8 x 4 bits = 32 bits, well
    inside 63). Registered/driver-facing outputs must be scalar (the
    driver canonicalizer cannot hash list cells — the r7 v8 err; see
    the schema lint in tests/test_scale_ops.py), so the packed form is
    what certification rows carry while the serve internals keep the
    array. NULL code packs to NULL."""
    return F.aggregate(
        code_col,
        F.lit(0).cast("bigint"),
        lambda acc, c: acc * k + c,
    )


def _pq_code_expr(
    vec,
    m: int,
    k: int,
    subdim: int,
    books: list[list[list[float]]] | None = None,
):
    """The PQ code as a reusable column expression (NULL for NULL or
    too-short vectors). ``books`` defaults to the deterministic grid
    codebooks; pass :func:`fit_pq_codebooks` output for trained ones
    — the expression tree (and so the plan) is identical either way,
    only the literals differ.

    ``vec`` may be a Column or a SQL fragment string (the fast
    construction path — see :func:`_pq_subdists`)."""
    if books is None:
        books = pq_codebooks(m, k, subdim)
    if isinstance(vec, str):
        codes = []
        for j, book in enumerate(books):
            d = _pq_subdists_sql(vec, j, book, subdim)
            codes.append(
                F.expr(
                    f"CAST(array_position({d}, array_min({d})) - 1 "
                    "AS INT)"
                )
            )
        ve = F.expr(vec)
        return F.when(
            ve.isNotNull() & (F.size(ve) >= m * subdim),
            F.array(*codes),
        )
    codes = []
    for j, book in enumerate(books):
        dists = _pq_subdists(vec, j, book, subdim)
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast(
                "int"
            )
        )
    return F.when(
        vec.isNotNull() & (F.size(vec) >= m * subdim),
        F.array(*codes),
    )


def build_pq_lsh_index(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    m: int = 8,
    k: int = 16,
    subdim: int = 8,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """PQ-compressed ANN index: (vec_id, lsh bucket, pq_code). The
    float corpus never ships to serving — m bytes + a bucket id per
    vector (vs dim*4 B raw, dim B int8): the tier for corpora whose
    int8 form still doesn't fit the serving fleet's memory."""
    vec = as_double_array(vec_col)
    planes = hyperplanes(n_planes, dim)
    return emb.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) >= dim)
    ).select(
        F.col(id_col).alias("vec_id"),
        lsh_bucket(sql_double_array(vec_col), planes).alias(
            "bucket"
        ),
        _pq_code_expr(vec_col, m, k, subdim, books).alias(
            "pq_code"
        ),
    )


def _adc_fold(pq_m: int):
    """ADC score: sum of m LUT lookups (lut[j][code[j]]) — the only
    per-candidate arithmetic in any PQ serve tier. Shared by the
    LSH-bucketed (:func:`search_pq_lsh`) and IVF-residual
    (:func:`search_ivf_pq`) serves.

    UNROLLED (r14 optimization, guide §1.2 step 2 / §4.1): the former
    ``F.aggregate(F.sequence(...))`` higher-order form is
    CodegenFallback — interpreted per candidate row, allocating the
    index array and invoking the lambda m times, and it is evaluated
    on EVERY candidate of every probed cell (the hottest expression
    in all seven PQ serve tiers). The flat ``lit(0.0) + t0 + ... +
    t(m-1)`` chain below is whole-stage-codegen'd. Summation order is
    IDENTICAL to the fold (left-to-right from the 0.0 seed), so the
    double result is bit-for-bit the same — the v9pss/v9rp oracle
    rows stay hash-green. The lsh_bucket re-inlining trap does not
    apply: ``lut``/``pq_code`` are materialized attribute columns in
    every caller (checkpointed LUT relation, persisted index), and
    the fold form referenced them once per lambda invocation anyway."""
    expr = F.lit(0.0)
    for j in range(pq_m):
        expr = expr + F.element_at(
            F.element_at(F.col("lut"), j + 1),
            F.element_at(F.col("pq_code"), j + 1) + 1,
        )
    return expr



def search_pq_lsh(
    index: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    pq_m: int = 8,
    pq_k: int = 16,
    subdim: int = 8,
    probe_hamming: int = 1,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """ADC (asymmetric distance computation) serve over the PQ index:
    each query precomputes its m x k lookup table of subspace
    distances ONCE, then every bucket-join candidate scores with m
    table lookups — no decode, no per-candidate arithmetic beyond the
    adds. Returns (query_id, vec_id, adc_dist, rank), rank 1 =
    closest by approximate squared L2.

    Scale shape: the LUT rides the (small) query side of the bucket
    join; candidates stream through one codegen'd fold of
    element_at's. The approximation error is the PQ quantization
    error only — the query side is exact (that is the 'asymmetric').
    """
    planes = hyperplanes(n_planes, dim)
    if books is None:
        books = pq_codebooks(pq_m, pq_k, subdim)
    lut = F.array(
        *[
            _pq_subdists(query_vec_col, j, books[j], subdim)
            for j in range(pq_m)
        ]
    )
    # Materialize the per-query LUT BEFORE the probe explode:
    # projection collapse would otherwise re-inline the m*k distance
    # computation into every exploded probe row (radius 2 = 37
    # recomputes per query — measured 3x the whole serve time). The
    # query side is small; the checkpoint is queries x (m*k+2) values.
    q_base = queries.select(
        F.col(query_id_col).alias("query_id"),
        lut.alias("lut"),
        probe_buckets(
            lsh_bucket(sql_double_array(query_vec_col), planes),
            n_planes,
            probe_hamming,
        ).alias("probes"),
    ).localCheckpoint(eager=False)
    q = q_base.select(
        "query_id", "lut", F.explode("probes").alias("bucket")
    )
    cand = index.join(q, "bucket")
    score = _adc_fold(pq_m)
    scored = cand.select(
        "query_id", "vec_id", score.alias("adc_dist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adc_dist", "rank")
    )


def build_ivf_pq_index(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    subdim: int = 8,
    seed: int = 42,
    sample_fraction: float | None = None,
    product_assignment: bool = False,
    coarse_books: list[list[list[float]]] | None = None,
    books: list[list[list[float]]] | None = None,
) -> tuple[DataFrame, DataFrame, list[list[list[float]]]]:
    """IVF-PQ index (Jégou et al.: IVFADC) — the industry-standard
    composed ANN index: KMeans-partition the corpus (IVF), then
    PQ-encode each vector's RESIDUAL against its cell centroid.
    Residuals are centered near zero with much smaller spread than
    raw vectors, so the same code budget quantizes them far more
    finely — and the codebooks are FIT on the residual distribution
    (:func:`fit_pq_codebooks`), not guessed, which the r6 scale
    lesson showed is the difference between a useful quantizer and
    noise. Returns (index rows (vec_id, cell, pq_code), centroid
    table, trained books).

    ``product_assignment`` (r8 verdict directive 6) swaps the flat
    coarse quantizer for the inverted multi-index (Babenko &
    Lempitsky, CVPR 2012): the coarse level becomes a 2-subspace PQ —
    two KMeans codebooks of ceil(sqrt(n_centroids)) centers, each
    fit on ONE HALF of the vector; a vector's cell is the pair of
    per-half argmins. The flat transform scores n x C full-dim dots
    — the same hidden quadratic the r8 sf1.0 probe caught in
    SemDeDup's assignment once C scales with the corpus (C =
    n/occupancy makes it O(n^2)); product assignment scores
    n x 2*sqrt(C) HALF-dim distances = O(n^1.5) with a tiny
    constant. The residual is computed per-half against the two
    small codebooks (v - concat(bookA[a], bookB[b])) — NOTHING
    C-sized is ever built or scored on the corpus side; only the
    serve-time probe ranking still meets the C-row centroid table
    (queries x C — query-side, and the returned table is exactly
    the concatenated pair grid so :func:`search_ivf_pq` is
    unchanged).

    Scale shape: the KMeans fit(s) run on a seeded sample; the
    corpus is touched by one transform pass + one residual/encode
    pass (broadcast centroid join, zero shuffle beyond the IVF
    build's own); the serving index is m bytes + a cell id per
    vector."""
    if product_assignment:
        return _build_ivf_pq_index_product(
            corpus, n_centroids, id_col, vec_col, m, k, subdim,
            seed, sample_fraction, coarse_books, books,
        )
    assigned, cents = build_ivf_index(
        corpus, n_centroids, id_col, vec_col, seed, sample_fraction
    )
    resid = assigned.join(F.broadcast(cents), "cell").select(
        "vec_id",
        "cell",
        F.zip_with("v", "centroid", lambda a, b: a - b).alias(
            "residual"
        ),
    )
    books = fit_pq_codebooks(
        resid,
        vec_col="residual",
        m=m,
        k=k,
        subdim=subdim,
        seed=seed,
        sample_fraction=sample_fraction,
    )
    index = resid.select(
        "vec_id",
        "cell",
        _pq_code_expr("residual", m, k, subdim, books).alias(
            "pq_code"
        ),
    )
    return index, cents, books


def fit_coarse_half_books(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> list[list[list[float]]]:
    """The product coarse quantizer's two half-space codebooks —
    exactly a 2-subspace trained PQ (ceil(sqrt(n_centroids)) centers
    per half). Fit once, share between
    ``build_ivf_pq_index(product_assignment=True, coarse_books=...)``
    and :func:`search_ivf_pq_product` (the serve side ranks cells
    per half against these same books, so they are part of the
    index contract, like ``books`` is for the residual PQ)."""
    import math

    kc = max(2, math.isqrt(n_centroids - 1) + 1)
    return fit_pq_codebooks(
        corpus,
        vec_col=vec_col,
        m=2,
        k=kc,
        subdim=dim // 2,
        seed=seed + 101,
        sample_fraction=sample_fraction,
    )


def _build_ivf_pq_index_product(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    m: int,
    k: int,
    subdim: int,
    seed: int,
    sample_fraction: float | None,
    coarse_books: list[list[list[float]]] | None = None,
    books: list[list[list[float]]] | None = None,
) -> tuple[DataFrame, DataFrame, list[list[list[float]]]]:
    """Inverted-multi-index build path of :func:`build_ivf_pq_index`
    (see its docstring): coarse level = 2-subspace trained PQ over
    vector halves, cell = a * kc + b, residual computed against the
    two small half-codebooks without materializing anything C-sized
    on the corpus side. Returns the same (index, centroid table,
    books) contract — the centroid table is the kc x kc concatenated
    pair grid, so the serve path needs no change."""
    dim = m * subdim
    half = dim // 2
    coarse = coarse_books or fit_coarse_half_books(
        corpus, n_centroids, vec_col, dim, seed, sample_fraction
    )
    kc = len(coarse[0])
    filtered = corpus.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) >= dim)
    )
    # per-half argmin codes: n x 2*kc half-dim distance chains — the
    # O(n^1.5) replacement for the flat n x C full-dim transform
    code = _pq_code_expr(vec_col, 2, kc, half, coarse)
    assigned = filtered.select(
        F.col(id_col).alias("vec_id"),
        as_double_array(vec_col).alias("v"),
        code.alias("__cc"),
    )
    book_a = lit_double_matrix(coarse[0])
    book_b = lit_double_matrix(coarse[1])
    r_a = F.zip_with(
        F.slice("v", 1, half),
        F.element_at(book_a, F.col("__cc")[0] + 1),
        lambda a, b: a - b,
    )
    r_b = F.zip_with(
        F.slice("v", half + 1, half),
        F.element_at(book_b, F.col("__cc")[1] + 1),
        lambda a, b: a - b,
    )
    resid = assigned.select(
        "vec_id",
        (F.col("__cc")[0] * kc + F.col("__cc")[1]).alias("cell"),
        F.concat(r_a, r_b).alias("residual"),
    )
    books = books or fit_pq_codebooks(
        resid,
        vec_col="residual",
        m=m,
        k=k,
        subdim=subdim,
        seed=seed,
        sample_fraction=sample_fraction,
    )
    index = resid.select(
        "vec_id",
        "cell",
        _pq_code_expr("residual", m, k, subdim, books).alias(
            "pq_code"
        ),
    )
    # kc^2 concatenated pair centroids — built driver-side from the
    # two SMALL books; only serve-time probe ranking (queries x C)
    # touches it, never the corpus.
    cents = _centroid_df(
        corpus.sparkSession,
        [a + b for a in coarse[0] for b in coarse[1]],
    )
    return index, cents, books


def search_ivf_pq(
    index: DataFrame,
    centroids: DataFrame,
    books: list[list[list[float]]],
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    pq_m: int = 8,
    pq_k: int = 16,
    subdim: int = 8,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVFADC serve: rank cells by exact L2 to the query, and for
    each of the ``n_probe`` probed cells build the query's LUT over
    the RESIDUAL space (distances from q - centroid to every
    codeword — the asymmetric part: the query side is exact).
    Candidates in probed cells then cost m table-lookup adds each
    (:func:`_adc_fold`), approximating ||q - v||^2 with only the PQ
    quantization error. Returns (query_id, vec_id, adc_dist, rank).

    Scale shape: the LUT relation is queries x n_probe rows (tiny,
    lazily checkpointed so projection collapse cannot re-inline the
    m*k lattice into every candidate row); the index streams through
    one bucket... cell join. Same pattern as :func:`search_pq_lsh`,
    with cells instead of hash buckets and per-(query, cell) LUTs
    instead of one per query."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        as_double_array(query_vec_col).alias("qv"),
    )
    cdist = F.aggregate(
        F.zip_with(
            F.col("qv"), F.col("centroid"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    qc = (
        q.join(F.broadcast(centroids))
        .select("query_id", "qv", "cell", "centroid", cdist.alias("cd"))
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.asc("cd"), F.col("cell")
                )
            ),
        )
        .filter(F.col("crank") <= n_probe)
    )
    # rq inline as a SQL fragment: same tree the Column form built
    # (each subdist slices its own copy — unchanged), parsed once
    rq_sql = "zip_with(qv, centroid, (a, b) -> a - b)"
    lut = F.array(
        *[
            _pq_subdists(rq_sql, j, books[j], subdim)
            for j in range(pq_m)
        ]
    )
    q_lut = qc.select(
        "query_id", "cell", lut.alias("lut")
    ).localCheckpoint(eager=False)
    # The LUT side is queries x n_probe rows (tiny); the index is the
    # corpus. BROADCAST the LUT so the index never moves at serve
    # time — without the hint AQE picked a sort-merge join here,
    # shuffling + sorting the corpus-sized index per serve batch
    # (r7 verdict: 3 shuffles/1 smj on the most expensive bench
    # entry). Same shape search_pq_lsh gets: 1 shuffle, 1 bhj.
    cand = index.join(F.broadcast(q_lut), "cell")
    scored = cand.select(
        "query_id", "vec_id", _adc_fold(pq_m).alias("adc_dist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adc_dist", "rank")
    )


def search_ivf_pq_product(
    index: DataFrame,
    coarse_books: list[list[list[float]]],
    books: list[list[list[float]]],
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    per_half: int | None = None,
    pq_m: int = 8,
    pq_k: int = 16,
    subdim: int = 8,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVFADC serve over a PRODUCT-assigned index (the serve half of
    the inverted multi-index, Babenko & Lempitsky CVPR 2012 —
    relational form): cells are ranked PER HALF, never flat. Each
    query scores kc codewords per half (2*sqrt(C) half-dim distance
    chains), keeps the ``per_half`` best of each, re-ranks the
    per_half^2 candidate PAIRS by d0 + d1 — which IS the full L2 to
    the concatenated pair centroid, since the halves are disjoint —
    and probes the ``n_probe`` best. The flat :func:`search_ivf_pq`
    probe scores queries x C full-dim distances against a C-row
    centroid table; at corpus-scaled C (C = n/occupancy — the
    regime product assignment exists for) that table stops being
    broadcastable and the scan stops being cheap. Here NOTHING
    C-sized exists at all — both serve and build touch only the two
    sqrt(C)-row codebooks.

    Approximation note: taking the top ``per_half`` per half before
    pairing can miss a pair whose total ranks high but whose halves
    both sit just past the cutoff (true IMI walks the pair frontier
    incrementally); per_half defaults to n_probe, and with
    per_half = kc the probe ranking is exhaustive and equivalent to
    the flat ranking over the pair grid.

    Residual LUTs are built from the pair's half-codewords directly
    (concat of per-half subtractions — elementwise identical to
    subtracting the concatenated centroid), lazily checkpointed
    (queries x n_probe rows), and broadcast into ONE index scan:
    same 1-Exchange / bhj serve shape as every other tier, index
    immobile."""
    kc = len(coarse_books[0])
    per_half = min(per_half if per_half is not None else n_probe, kc)
    half = len(coarse_books[0][0])
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        as_double_array(query_vec_col).alias("qv"),
    )

    def top_half(level: int, cell_name: str, d_name: str) -> DataFrame:
        dists = _pq_subdists(
            "qv", level, coarse_books[level], half
        )
        lvl = q.select(
            "query_id",
            "qv",
            F.posexplode(dists).alias(cell_name, d_name),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.asc(d_name), F.col(cell_name)
        )
        out = lvl.withColumn("__hr", F.row_number().over(w)).filter(
            F.col("__hr") <= per_half
        )
        # qv rides only level 0 (one copy per pair after the join)
        keep = ["query_id", cell_name, d_name] + (
            ["qv"] if level == 0 else []
        )
        return out.select(*keep)

    pairs = top_half(0, "ha", "da").join(
        top_half(1, "hb", "db"), "query_id"
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.asc(F.col("da") + F.col("db")),
        F.col("ha"),
        F.col("hb"),
    )
    probed = (
        pairs.withColumn("__pr", F.row_number().over(wp))
        .filter(F.col("__pr") <= n_probe)
        .select(
            "query_id",
            "qv",
            "ha",
            "hb",
            (F.col("ha") * kc + F.col("hb")).alias("cell"),
        )
    )
    book_a = lit_double_matrix(coarse_books[0])
    book_b = lit_double_matrix(coarse_books[1])
    rq = F.concat(
        F.zip_with(
            F.slice("qv", 1, half),
            F.element_at(book_a, F.col("ha") + 1),
            lambda a, b: a - b,
        ),
        F.zip_with(
            F.slice("qv", half + 1, half),
            F.element_at(book_b, F.col("hb") + 1),
            lambda a, b: a - b,
        ),
    )
    # rq MUST be a materialized column before the LUT references it:
    # _pq_subdists slices rq m*k times, and slicing the raw
    # concat(zip_with...) expression makes Catalyst re-evaluate the
    # whole residual construction once per codeword chain — the r6
    # expression-blowup trap (measured 2x the whole serve wall here).
    probed_rq = probed.select(
        "query_id", "cell", rq.alias("rq")
    ).localCheckpoint(eager=False)
    lut = F.array(
        *[
            _pq_subdists("rq", j, books[j], subdim)
            for j in range(pq_m)
        ]
    )
    # materialize BEFORE the index join (r6 lesson: projection
    # collapse would re-inline the m*k lattice into every candidate)
    q_lut = probed_rq.select(
        "query_id", "cell", lut.alias("lut")
    ).localCheckpoint(eager=False)
    cand = index.join(F.broadcast(q_lut), "cell")
    scored = cand.select(
        "query_id", "vec_id", _adc_fold(pq_m).alias("adc_dist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adc_dist", "rank")
    )


def search_ivf_pq_rerank(
    index: DataFrame,
    centroids: DataFrame,
    books: list[list[list[float]]],
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    n_probe: int = 4,
    pq_m: int = 8,
    pq_k: int = 16,
    subdim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVFADC + exact re-ranking (the refinement stage of Jégou et
    al.'s IVFADC+R, TPAMI 2011 §V): stage 1 retrieves a SHORTLIST of
    ``shortlist`` candidates per query by ADC distance (8-byte codes,
    quantization error and all), stage 2 re-scores ONLY those
    queries x shortlist rows with exact cosine against the raw
    vectors and keeps the top ``k``. Buys back the ADC ranking error
    for the price of touching ``shortlist`` full vectors per query —
    recall is then bounded by the shortlist's candidate recall, not
    by code resolution, which is why production ANN serves pair a
    coarse quantized index with a small exact rerank.

    Scale shape: the shortlist relation is queries x shortlist rows
    (tiny — lazily checkpointed so stage 1's window/filter isn't
    re-planned into the rerank join) and is BROADCAST into one raw
    corpus scan: neither the PQ index (stage 1) nor the raw corpus
    (stage 2) ever shuffles at serve time. One bhj per stage, both
    windows partitioned by query_id."""
    cand = (
        search_ivf_pq(
            index,
            centroids,
            books,
            queries,
            k=shortlist,
            n_probe=n_probe,
            pq_m=pq_m,
            pq_k=pq_k,
            subdim=subdim,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
        )
        .select("query_id", "vec_id")
        .localCheckpoint(eager=False)
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        as_double_array(query_vec_col).alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        as_double_array(vec_col).alias("v"),
    )
    scored = c.join(
        F.broadcast(cand.join(q, "query_id")), "vec_id"
    ).select(
        "query_id",
        "vec_id",
        cosine(F.col("v"), F.col("qv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("vec_id")
    )
    return (
        scored.filter(F.col("cosine").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def ivf_pq_grid_centroids(
    n_cells: int = 16, dim: int = 64, scale: float = 0.125
) -> list[list[float]]:
    """:func:`grid_centroids` scaled to the DATA's element range and
    re-rounded to 6 dp (exact literals on any engine). Unit-norm
    embeddings have elements ~ +/- 1/sqrt(dim) = 0.125 at dim 64;
    centroids at that scale leave residuals of comparable spread
    instead of residuals dominated by the centroid itself — the same
    scale lesson :func:`pq_codebooks` documents. Scaling does not
    change max-dot cell RANKING (dot(v, s*c) = s*dot(v, c), s > 0),
    but the residuals it leaves behind do depend on it."""
    return [
        [round(x * scale, 6) for x in row]
        for row in grid_centroids(n_cells, dim)
    ]


def build_ivf_pq_grid_index(
    corpus: DataFrame,
    n_cells: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    subdim: int = 8,
    book_scale: float = 0.25,
) -> DataFrame:
    """Deterministic IVFADC twin of :func:`build_ivf_pq_index`: the
    KMeans coarse quantizer is swapped for :func:`ivf_pq_grid_centroids`
    (max-dot assignment via :func:`assign_cells_fixed` — the exact
    plumbing v4p certified) and the trained residual codebooks for
    :func:`pq_codebooks` at residual scale, so a DuckDB oracle can
    reproduce cell assignment, residual computation, and per-subspace
    argmin bit-for-bit (same left-fold association everywhere).
    v9's production path keeps the trained fit; this twin certifies
    the IVF->residual->PQ machinery with a hash-matched driver row
    (r7 verdict directive 4). Returns (vec_id, cell, pq_code).

    Scale shape: identical to the production build minus the fit —
    broadcast centroid scoring + max_by coarse assignment (one
    shuffle), broadcast centroid join for residuals, then the
    zero-shuffle PQ encode projection."""
    filtered = corpus.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) >= dim)
    )
    cents = ivf_pq_grid_centroids(n_cells, dim)
    assigned = assign_cells_fixed(filtered, cents, id_col, vec_col)
    cent_df = _centroid_df(corpus.sparkSession, cents)
    books = pq_codebooks(m, k, subdim, scale=book_scale)
    resid = assigned.join(F.broadcast(cent_df), "cell").select(
        "vec_id",
        "cell",
        F.zip_with(
            "v", "centroid", lambda a, b: a - b
        ).alias("residual"),
    )
    return resid.select(
        "vec_id",
        "cell",
        _pq_code_expr("residual", m, k, subdim, books).alias(
            "pq_code"
        ),
    )


def build_ivf_pq_grid_index_product(
    corpus: DataFrame,
    kc: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    subdim: int = 8,
    coarse_scale: float = 0.125,
    book_scale: float = 0.25,
) -> tuple[DataFrame, list, list]:
    """Deterministic inverted-multi-index twin of
    ``build_ivf_pq_index(product_assignment=True)`` — both KMeans
    fits swapped for :func:`pq_codebooks` grids (coarse half-books at
    DATA scale, residual books at residual scale — the same scale
    split v9p certified), so a DuckDB oracle can reproduce the
    per-half argmin assignment, pair-cell packing, per-half residual,
    and residual PQ codes bit-for-bit. Returns
    (index, coarse_books, books) ready for
    :func:`search_ivf_pq_product` — together they give the IMI serve
    path a DIRECT oracle certification (r9 verdict directive 8; the
    pytest pin at per_half=sqrt(C) was transitive)."""
    coarse = pq_codebooks(2, kc, dim // 2, scale=coarse_scale)
    books = pq_codebooks(m, k, subdim, scale=book_scale)
    index, _, _ = build_ivf_pq_index(
        corpus,
        n_centroids=kc * kc,
        id_col=id_col,
        vec_col=vec_col,
        m=m,
        k=k,
        subdim=subdim,
        product_assignment=True,
        coarse_books=coarse,
        books=books,
    )
    return index, coarse, books

"""Property-based tests (hypothesis) for the operator contracts that
have algebraic definitions — packing equivalence, chunk coverage,
timestamp-shape independence. Each example generates a whole input
table (one Spark job per example, small max_examples) so the suite
stays fast while still searching the input space."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from garmin_data_pipeline_spark.operators import sampling as sp
from garmin_data_pipeline_spark.operators import text as tx
from garmin_data_pipeline_spark.functions.durations import epoch_micros

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SET
@given(
    sizes=st.lists(
        st.one_of(st.integers(min_value=0, max_value=120), st.none()),
        min_size=1,
        max_size=40,
    ),
    budget=st.integers(min_value=1, max_value=64),
    n_shards=st.integers(min_value=1, max_value=4),
)
def test_sharded_packing_matches_global_within_each_shard(
    spark, sizes, budget, n_shards
):
    """For ANY sizes (zeros, oversized rows, NULLs) and any budget:
    (a) with one shard, the sharded packer reproduces the global
    packer's bin ids exactly; (b) with any shard count, shards'
    bin-id ranges are disjoint, ids only step forward in packing
    order (an oversized row may SKIP ids — bin = floor(cumsum/
    budget) — but never reuses one), and every row keeps exactly
    one bin."""
    rows = [
        (i, sz, i % n_shards) for i, sz in enumerate(sizes)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, n long, shard long"
    )
    # (a) single-shard equivalence with the global form
    one = df.withColumn("shard1", F.pmod("doc_id", F.lit(1)))
    got = {
        r["doc_id"]: r["bin_id"]
        for r in sp.pack_sequences_sharded(
            one, "n", budget, "shard1", ["doc_id"]
        ).collect()
    }
    want = {
        r["doc_id"]: r["bin_id"]
        for r in sp.pack_sequences(df, "n", budget, ["doc_id"]).collect()
    }
    assert got == want

    # (b) multi-shard invariants
    out = sp.pack_sequences_sharded(
        df, "n", budget, "shard", ["doc_id"]
    ).collect()
    assert len(out) == len(sizes)  # no row lost or duplicated
    by_shard: dict[int, list] = {}
    for r in sorted(out, key=lambda r: r["doc_id"]):
        by_shard.setdefault(r["shard"], []).append(r)
    ranges: list[tuple[int, int]] = []
    for shard_rows in by_shard.values():
        bins = [r["bin_id"] for r in shard_rows]
        # bins only step forward in packing order
        assert bins == sorted(bins)
        # exact local semantics: bin = floor(exclusive-cumsum/budget)
        cum = 0
        for r in shard_rows:
            assert r["bin_id"] - bins[0] == cum // budget
            cum += r["n"] or 0
        ranges.append((min(bins), max(bins)))
    # shards' bin-id ranges are pairwise disjoint (global uniqueness)
    ranges.sort()
    for (_, hi), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi < lo2


@SET
@given(
    n_tokens=st.integers(min_value=0, max_value=200),
    chunk=st.integers(min_value=2, max_value=64),
    data=st.data(),
)
def test_chunking_rebuilds_the_document(spark, n_tokens, chunk, data):
    """For ANY doc length and (chunk, overlap) with overlap < chunk:
    concatenating chunk 0 plus each later chunk's post-overlap suffix
    reproduces the token stream exactly; every chunk except the last
    is full-width; chunk indexes are 0..k-1."""
    overlap = data.draw(st.integers(min_value=0, max_value=chunk - 1))
    text = " ".join(f"w{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = sorted(
        tx.chunk_documents(
            df, chunk_tokens=chunk, overlap=overlap
        ).collect(),
        key=lambda r: r["chunk_index"],
    )
    if n_tokens == 0:
        assert rows == []
        return
    assert [r["chunk_index"] for r in rows] == list(range(len(rows)))
    chunks = [r["chunk_text"].split(" ") for r in rows]
    rebuilt = chunks[0] + [t for c in chunks[1:] for t in c[overlap:]]
    assert rebuilt == [f"w{i}" for i in range(n_tokens)]
    for c in chunks[:-1]:
        assert len(c) == chunk


@SET
@given(
    micros=st.lists(
        st.integers(
            min_value=0,  # 1970
            max_value=4102444800_000_000,  # 2100
        ),
        min_size=1,
        max_size=20,
    ),
    tz=st.sampled_from(
        ["UTC", "America/New_York", "Asia/Tokyo", "Europe/Berlin"]
    ),
)
def test_epoch_micros_shape_and_timezone_independent(spark, micros, tz):
    """With the dtype in hand (how every operator calls it),
    epoch_micros returns the same integer whether ts is TIMESTAMP_NTZ
    or TIMESTAMP (instant), under ANY session timezone — for NTZ it
    inverts timestamp construction exactly. (Without dtype the
    NTZ fallback is only exact under a UTC session/JVM zone — see the
    epoch_micros docstring.)"""
    naive = [
        (i, dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=m), m)
        for i, m in enumerate(micros)
    ]
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        ntz = spark.createDataFrame(
            naive, "i long, ts timestamp_ntz, m long"
        )
        got_ntz = ntz.select(
            "m",
            epoch_micros("ts", ntz.schema["ts"].dataType).alias("e"),
        ).collect()
        assert all(r["e"] == r["m"] for r in got_ntz)

        # instant twin: timestamp_micros() builds TIMESTAMP (LTZ)
        ltz = spark.createDataFrame(
            [(i, m) for i, _, m in naive], "i long, m long"
        ).select("m", F.timestamp_micros("m").alias("ts"))
        got_ltz = ltz.select(
            "m",
            epoch_micros("ts", ltz.schema["ts"].dataType).alias("e"),
        ).collect()
        assert all(r["e"] == r["m"] for r in got_ltz)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


@SET
@given(
    n_keys=st.integers(min_value=1, max_value=300),
    w1=st.integers(min_value=1, max_value=8),
    w2=st.integers(min_value=0, max_value=8),
    w3=st.integers(min_value=0, max_value=8),
    salt=st.sampled_from(["a", "b", "split-v1"]),
)
def test_hash_split_total_and_disjoint(spark, n_keys, w1, w2, w3, salt):
    """For ANY weights and salt: hash_split is a total function (every
    key gets exactly one split, no key lost), only names from the
    weight dict appear, and the assignment is a pure function of
    (key, salt) — re-evaluating over a different partitioning changes
    nothing."""
    total = w1 + w2 + w3
    weights = {"train": w1 / total}
    if w2:
        weights["val"] = w2 / total
    if w3:
        weights["test"] = w3 / total
    df = spark.range(0, n_keys).withColumnRenamed("id", "k")
    out = sp.hash_split(df, "k", weights, salt=salt).collect()
    assert len(out) == n_keys
    assert {r["split"] for r in out} <= set(weights)
    again = {
        r["k"]: r["split"]
        for r in sp.hash_split(
            df.repartition(5), "k", weights, salt=salt
        ).collect()
    }
    assert again == {r["k"]: r["split"] for r in out}


@SET
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-100,
                max_value=100,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=12,
    ),
)
def test_quantize_buckets_bounded_and_monotone(spark, vecs):
    """For ANY finite vectors: every bucket is in [0, 255], each
    vector's min maps to 0 and max to 255 (or all-zero when flat),
    and quantization preserves per-vector element order (monotone)."""
    from garmin_data_pipeline_spark.operators import similarity as sim

    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<double>"
    )
    out = sim.quantize_embeddings(df).collect()
    assert len(out) == len(vecs)
    for r in out:
        v, q = vecs[r["vec_id"]], r["qvec"]
        assert all(0 <= b <= 255 for b in q)
        if max(v) == min(v):
            assert all(b == 0 for b in q)
        else:
            assert q[v.index(min(v))] == 0
            assert q[v.index(max(v))] == 255
        # monotone: x <= y => q(x) <= q(y)
        pairs = sorted(zip(v, q))
        assert all(
            b1 <= b2 for (_, b1), (_, b2) in zip(pairs, pairs[1:])
        )


@SET
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),
            st.integers(min_value=0, max_value=25),
        ),
        min_size=1,
        max_size=40,
    ),
)
def test_connected_components_algorithms_agree(spark, edges):
    """For ANY random pair list (self-loops, duplicates, reversed
    edges): min-label propagation and large-star/small-star produce
    the IDENTICAL (node, component) labeling, and it equals a
    driver-side union-find ground truth."""
    from garmin_data_pipeline_spark.operators import graph as g

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    a = {
        (r["node"], r["component"])
        for r in g.connected_components(df, "doc_a", "doc_b").collect()
    }
    b = {
        (r["node"], r["component"])
        for r in g.connected_components_star(
            df, "doc_a", "doc_b"
        ).collect()
    }
    assert a == b

    # union-find ground truth
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    want = {(n, find(n)) for n in parent}
    assert a == want


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])


@SET
@given(
    texts=st.lists(
        st.text(
            alphabet="ab c",  # tiny alphabet => real dup/near-dup pairs
            min_size=0,
            max_size=24,
        ),
        min_size=2,
        max_size=12,
    ),
    max_dist=st.integers(min_value=0, max_value=6),
)
def test_capped_edit_distance_equals_uncapped_filtered(
    spark, texts, max_dist
):
    """For ANY corpus and ANY cap: capped verify_edit_distance ==
    uncapped-then-filter (the provable-equivalence claim its
    docstring makes — the length gap lower-bounds edit distance, and
    the banded kernel agrees with the full kernel inside the band).
    All-pairs candidates so the property covers every pair shape,
    including empty strings and identical texts."""
    from garmin_data_pipeline_spark.operators.dedup_scale import (
        verify_edit_distance,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [
            (a, b)
            for a in range(len(texts))
            for b in range(a + 1, len(texts))
        ],
        "doc_a long, doc_b long",
    )
    uncapped = {
        (r.doc_a, r.doc_b): r.edit_dist
        for r in verify_edit_distance(pairs, docs).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.edit_dist
        for r in verify_edit_distance(
            pairs, docs, max_dist=max_dist
        ).collect()
    }
    expected = {k: v for k, v in uncapped.items() if v <= max_dist}
    assert capped == expected


@SET
@given(
    base=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),           # key
            st.one_of(st.none(), st.sampled_from(["d1", "d2"])),  # part
            st.integers(min_value=0, max_value=50),          # ver
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    ups=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=51, max_value=99),
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
)
def test_merge_upsert_nullsafe_partitions_property(
    spark, tmp_path_factory, base, ups
):
    """For ANY base table (incl. NULL partitions) and ANY update
    batch: after merge_upsert, the table holds exactly
    base-keys ∪ update-keys, update rows win for their keys, and
    every untouched base row survives byte-identical — in particular
    rows sharing the NULL partition with updated keys. (The ADVICE r6
    silent-deletion shape, searched over the input space.)

    Updates keep each key's original partition (the documented
    partition-stability invariant); new keys land in 'd1'."""
    from garmin_data_pipeline_spark.sources.sinks import merge_upsert

    part_of = {k: p for k, p, _ in base}
    rows = [(k, p, float(v)) for k, p, v in base]
    up_rows = [
        (k, part_of.get(k, "d1"), float(v)) for k, v in ups
    ]
    tmp = tmp_path_factory.mktemp("merge_prop")
    table = "t_merge_prop"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    import shutil

    shutil.rmtree(
        f"/tmp/spark-test-warehouse/{table}", ignore_errors=True
    )
    spark.createDataFrame(
        rows, "k long, part string, v double"
    ).write.partitionBy("part").saveAsTable(table)
    merge_upsert(
        spark,
        table,
        spark.createDataFrame(
            up_rows, "k long, part string, v double"
        ),
        keys=["k"],
        order_col="v",
        partition_col="part",
        staging_dir=str(tmp / "stage"),
    )
    spark.sql(f"REFRESH TABLE {table}")
    got = {r.k: (r.part, r.v) for r in spark.table(table).collect()}
    want = {k: (p, float(v)) for k, p, v in rows}
    want.update(
        {k: (part_of.get(k, "d1"), float(v)) for k, v in ups}
    )
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    assert got == want


# --- prefix-filtered Jaccard losslessness (d8's operator) -----------
#
# The PPJoin prefix bound is a THEOREM (J >= t forces the two
# df-ordered prefixes to collide); this searches for a counterexample
# across corpus shapes AND thresholds instead of pinning three fixed
# ones. The uncapped inverted-index join is the ground truth.
@SET
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    threshold=st.sampled_from([0.3, 0.45, 0.6, 0.75, 0.9]),
    vocab_n=st.integers(min_value=8, max_value=25),
)
def test_prefix_jaccard_never_loses_a_pair(
    spark, seed, threshold, vocab_n
):
    import random

    from garmin_data_pipeline_spark.operators import dedup_scale as dd

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(vocab_n)]
    docs, did = [], 0
    for _ in range(8):  # base docs + near-dup variants
        base = [rng.choice(vocab) for _ in range(rng.randrange(4, 12))]
        for _ in range(rng.randrange(1, 4)):
            words = list(base)
            for _ in range(rng.randrange(0, 3)):
                words[rng.randrange(len(words))] = rng.choice(vocab)
            docs.append((did, " ".join(words)))
            did += 1
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    key = lambda r: (r["doc_a"], r["doc_b"])  # noqa: E731
    exact = {
        key(r): (r["inter"], r["jaccard"])
        for r in dd.ngram_jaccard_pairs(
            df, "doc_id", "text", n=2, threshold=threshold, max_df=None
        ).collect()
    }
    got = {
        key(r): (r["inter"], r["jaccard"])
        for r in dd.prefix_jaccard_pairs(
            df, "doc_id", "text", n=2, threshold=threshold
        ).collect()
    }
    assert got == exact


def _py_tokens(text: str) -> list[str]:
    import re

    return [
        t
        for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split()
        if t
    ]


def _py_substring_spans(
    texts: dict[int, str], k: int
) -> tuple[set[tuple], set[tuple]]:
    """Brute-force mirror of d10 (cross-doc duplicated windows,
    merged to maximal spans) AND d10x (all-but-canonical occurrence)
    over python token lists."""
    wins: dict[tuple[int, int], str] = {}
    by_text: dict[str, list[tuple[int, int]]] = {}
    for d, t in texts.items():
        toks = _py_tokens(t)
        for i in range(len(toks) - k + 1):
            w = " ".join(toks[i : i + k])
            wins[(d, i + 1)] = w
            by_text.setdefault(w, []).append((d, i + 1))

    def islands(hits: set[tuple[int, int]]) -> set[tuple]:
        out = set()
        for d in {x for x, _ in hits}:
            ps = sorted(p for x, p in hits if x == d)
            start = prev = ps[0]
            n = 1
            for p in ps[1:]:
                if p == prev + 1:
                    prev = p
                    n += 1
                else:
                    out.add((d, start, prev + k - 1,
                             prev + k - start, n))
                    start = prev = p
                    n = 1
            out.add((d, start, prev + k - 1, prev + k - start, n))
        return out

    dup_w = {
        w
        for w, occ in by_text.items()
        if len({d for d, _ in occ}) >= 2
    }
    d10_hits = {dp for dp, w in wins.items() if w in dup_w}
    d10x_hits = {
        dp
        for dp, w in wins.items()
        if w in dup_w and dp != min(by_text[w])
    }
    return islands(d10_hits), islands(d10x_hits)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_substring_spans_match_brute_force(spark, data):
    """d10/d10x vs a python brute force over random corpora built
    from a small vocabulary (so cross-doc window collisions actually
    occur) with an explicitly planted shared run."""
    from garmin_data_pipeline_spark.operators.dedup_scale import (
        exact_substring_spans,
        substring_excision_spans,
    )

    k = data.draw(st.integers(min_value=2, max_value=5))
    vocab = [f"w{i}" for i in range(6)]
    n_docs = data.draw(st.integers(min_value=2, max_value=5))
    planted = data.draw(
        st.lists(
            st.sampled_from(vocab),
            min_size=k,
            max_size=2 * k,
        )
    )
    texts = {}
    for d in range(1, n_docs + 1):
        body = data.draw(
            st.lists(st.sampled_from(vocab), min_size=0, max_size=25)
        )
        if data.draw(st.booleans()):
            pos = data.draw(
                st.integers(min_value=0, max_value=len(body))
            )
            body = body[:pos] + planted + body[pos:]
        texts[d] = " ".join(body)

    want_d10, want_d10x = _py_substring_spans(texts, k)
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got_d10 = {
        tuple(r)
        for r in exact_substring_spans(
            df, "doc_id", "text", k=k
        ).collect()
    }
    got_d10x = {
        tuple(r)
        for r in substring_excision_spans(
            df, "doc_id", "text", k=k
        ).collect()
    }
    assert got_d10 == want_d10, (texts, k)
    assert got_d10x == want_d10x, (texts, k)

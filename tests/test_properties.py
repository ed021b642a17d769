"""Property-based invariants (hypothesis) for the algebraic operators.

Spark-backed properties keep example counts small (each example runs real
jobs); the pure-Python winnowing reference gets full-strength fuzzing.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SPARK_SETTINGS = settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture])


# ---------------------------------------------------------------------------
# winnowing (pure python — fuzz hard)
# ---------------------------------------------------------------------------

texts = st.text(alphabet="abcdefgh ", min_size=0, max_size=120)


@settings(max_examples=200, deadline=None)
@given(a=texts, b=texts, shared=st.text(alphabet="xyzq", min_size=8, max_size=20))
def test_winnow_shared_substring_guarantee_fuzz(a, b, shared):
    """Any shared normalized substring of length k+window-1 (= 8) implies a
    shared fingerprint — the winnowing paper's core guarantee."""
    from eirepolitic_data_pipeline_spark.operators.dedupe import winnow_py
    fa = winnow_py(a + " " + shared, k=5, window=4)
    fb = winnow_py(shared + " " + b, k=5, window=4)
    assert set(fa) & set(fb)


@settings(max_examples=200, deadline=None)
@given(t=st.text(alphabet="abc .!XYZ0129", min_size=0, max_size=200))
def test_winnow_deterministic_and_sorted(t):
    from eirepolitic_data_pipeline_spark.operators.dedupe import winnow_py
    f1, f2 = winnow_py(t), winnow_py(t)
    assert f1 == f2 == sorted(set(f1))


# ---------------------------------------------------------------------------
# merge policy algebra
# ---------------------------------------------------------------------------

rows_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 3), st.integers(0, 100)),
    min_size=0, max_size=15)


@SPARK_SETTINGS
@given(existing=rows_strategy, incoming=rows_strategy)
def test_upsert_idempotent_and_incoming_wins(spark, existing, incoming):
    """merge(merge(E, I), I) == merge(E, I), and every incoming PK's row
    equals the incoming value (keep-last precedence)."""
    from eirepolitic_data_pipeline_spark.operators.merge import (
        WritePolicy, merge_for_policy)
    schema = "id int, bk int, v int"
    policy = WritePolicy(mode="upsert", primary_key=["id"])
    e = spark.createDataFrame(existing, schema) if existing else None
    i = spark.createDataFrame(incoming, schema) if incoming else \
        spark.createDataFrame([], schema)
    once = merge_for_policy(e, i, policy)
    twice = merge_for_policy(once, i, policy)
    m1 = {r["id"]: r["v"] for r in once.collect()}
    m2 = {r["id"]: r["v"] for r in twice.collect()}
    assert m1 == m2
    # incoming beats existing; last occurrence within incoming wins is NOT
    # guaranteed for duplicate incoming PKs, so only check singly-keyed ones
    from collections import Counter
    inc_counts = Counter(t[0] for t in incoming)
    for rid, bk, v in incoming:
        if inc_counts[rid] == 1:
            assert m1[rid] == v


# ---------------------------------------------------------------------------
# salted operators ≡ single-phase
# ---------------------------------------------------------------------------

@SPARK_SETTINGS
@given(rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 500)),
                     min_size=1, max_size=40),
       n=st.integers(1, 4), buckets=st.integers(1, 7))
def test_salted_top_n_equivalence_fuzz(spark, rows, n, buckets):
    from eirepolitic_data_pipeline_spark.operators.ranking import (
        top_n_per_group)
    from eirepolitic_data_pipeline_spark.operators.skew import salted_top_n
    df = spark.createDataFrame(
        [(k, i, v) for i, (k, v) in enumerate(rows)],
        "key int, row_id int, v int")
    order = [F.col("v").desc(), F.col("row_id")]
    got = {(r["key"], r["rank"]): r["row_id"]
           for r in salted_top_n(df, ["key"], order, n,
                                 buckets=buckets).collect()}
    want = {(r["key"], r["rank"]): r["row_id"]
            for r in top_n_per_group(df, ["key"], order, n).collect()}
    assert got == want


@SPARK_SETTINGS
@given(rows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 9)),
                     min_size=1, max_size=30),
       buckets=st.integers(1, 5))
def test_salted_string_agg_equivalence_fuzz(spark, rows, buckets):
    from eirepolitic_data_pipeline_spark.operators.skew import (
        salted_string_agg)
    df = spark.createDataFrame([(k, f"v{v}") for k, v in rows],
                               "key int, name string")
    got = {r["key"]: r["agg"] for r in
           salted_string_agg(df, ["key"], "name", buckets=buckets).collect()}
    want = {r["key"]: r["agg"] for r in df.groupBy("key").agg(
        F.array_join(F.array_sort(F.collect_set("name")), "; ")
        .alias("agg")).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# sequence packing invariants
# ---------------------------------------------------------------------------

@SPARK_SETTINGS
@given(toks=st.lists(st.integers(1, 400), min_size=1, max_size=50),
       budget=st.integers(50, 600), shards=st.integers(1, 4))
def test_pack_sequences_invariants_fuzz(spark, toks, budget, shards):
    from eirepolitic_data_pipeline_spark.operators.curation import (
        pack_sequences)
    df = spark.createDataFrame(list(enumerate(toks)), "doc_id long, n_tok long")
    packed = pack_sequences(df, "doc_id", "n_tok", budget=budget,
                            shards=shards).collect()
    assert len(packed) == len(toks)  # no rows lost or duplicated
    by_batch = {}
    for r in packed:
        by_batch.setdefault((r["shard"], r["batch_id"]), []).append(r)
    for rows_ in by_batch.values():
        total = sum(r["n_tok"] for r in rows_)
        assert total <= budget + max(r["n_tok"] for r in rows_)
    # batch ids are non-decreasing in doc order within a shard
    for shard in {r["shard"] for r in packed}:
        seq = sorted((r["doc_id"], r["batch_id"])
                     for r in packed if r["shard"] == shard)
        assert all(b1 <= b2 for (_, b1), (_, b2) in zip(seq, seq[1:]))


# ---------------------------------------------------------------------------
# decontamination / PII / component invariants (round-4 operators)
# ---------------------------------------------------------------------------

@SPARK_SETTINGS
@given(docs=st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1,
    max_size=8),
    bench_idx=st.lists(st.integers(0, 7), max_size=3))
def test_decontaminate_partitions_corpus_fuzz(spark, docs, bench_idx):
    """kept ∪ contaminated == corpus, disjoint; benchmark members always
    contaminate themselves when they have any n-gram at all."""
    from eirepolitic_data_pipeline_spark.operators.dedupe import decontaminate
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    bench_rows = [(100 + j, docs[i]) for j, i in enumerate(bench_idx)
                  if i < len(docs)]
    bench = spark.createDataFrame(bench_rows or [(999, "zzz")],
                                  "doc_id long, text string")
    kept, contaminated = decontaminate(corpus, bench, n=3)
    k = {r["doc_id"] for r in kept.collect()}
    c = {r["doc_id"] for r in contaminated.collect()}
    assert k | c == set(range(len(docs)))
    assert not (k & c)


@SPARK_SETTINGS
@given(s=st.text(min_size=0, max_size=80))
def test_redact_pii_idempotent_fuzz(spark, s):
    """redact(redact(x)) == redact(x): the replacement token can never
    itself match a PII pattern."""
    from eirepolitic_data_pipeline_spark.functions.text import redact_pii
    df = spark.createDataFrame([(s,)], "t string")
    row = df.select(
        redact_pii("t").alias("once"),
        redact_pii(redact_pii("t")).alias("twice")).collect()[0]
    assert row["once"] == row["twice"]


@SPARK_SETTINGS
@given(edges=st.lists(
    st.tuples(st.integers(1, 8), st.integers(1, 8)), max_size=10))
def test_min_label_components_is_a_valid_partition_fuzz(spark, edges):
    """Every id gets a canonical ≤ itself; endpoints of every edge share a
    canonical; canonicals are their own canonical (idempotent labels)."""
    from eirepolitic_data_pipeline_spark.operators.dedupe import (
        min_label_components)
    ids = spark.createDataFrame([(i,) for i in range(1, 9)], "id long")
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b] or [(1, 1)],
        "doc_a long, doc_b long")
    out = {r["id"]: r["canonical_id"]
           for r in min_label_components(ids, pairs).collect()}
    assert set(out) == set(range(1, 9))
    assert all(c <= i for i, c in out.items())
    assert all(out[c] == c for c in out.values())
    for a, b in edges:
        if a != b:
            assert out[a] == out[b]


# ---------------------------------------------------------------------------
# URL canonicalization (Spark-backed — small example counts)
# ---------------------------------------------------------------------------

url_hosts = st.from_regex(r"[a-z]{1,8}(\.[a-z]{2,6}){1,3}", fullmatch=True)
url_paths = st.from_regex(r"(/[A-Za-z0-9]{0,6}){0,3}/?", fullmatch=True)
url_params = st.lists(
    st.one_of(st.from_regex(r"[a-z]{1,4}=[A-Za-z0-9]{0,4}", fullmatch=True),
              st.sampled_from(["utm_source=x", "gclid=1", "fbclid=2",
                               "ref=home"])),
    min_size=0, max_size=4)


@SPARK_SETTINGS
@given(scheme=st.sampled_from(["http", "https", "HTTP", "HTTPS"]),
       www=st.booleans(), host=url_hosts, path=url_paths, params=url_params,
       frag=st.sampled_from(["", "#top", "#a-b"]))
def test_canonical_url_idempotent_fuzz(spark, scheme, www, host, path,
                                       params, frag):
    """canonical_url is a PROJECTION: applying it to its own output is a
    no-op. This is the property URL-level dedup relies on — a canonical
    key must not depend on how many normalization passes ran."""
    from eirepolitic_data_pipeline_spark.functions.urls import canonical_url
    q = ("?" + "&".join(params)) if params else ""
    url = f"{scheme}://{'www.' if www else ''}{host}{path}{q}{frag}"
    df = spark.createDataFrame([(url,)], "u string")
    once = df.select(canonical_url(F.col("u")).alias("c")).first()["c"]
    assert once is not None
    twice = (spark.createDataFrame([(once,)], "u string")
             .select(canonical_url(F.col("u")).alias("c")).first()["c"])
    assert twice == once


@SPARK_SETTINGS
@given(rows=st.lists(st.tuples(st.integers(0, 500), st.integers(0, 2)),
                     min_size=1, max_size=40, unique_by=lambda t: t[0]),
       alpha=st.sampled_from([0.0, 0.5, 0.7, 1.0]),
       target=st.integers(1, 60))
def test_mix_sources_invariants_fuzz(spark, rows, alpha, target):
    """mix_sources never upsamples (per-source kept <= source size), keeps
    every row a member of its original source, and is deterministic."""
    from eirepolitic_data_pipeline_spark.operators.curation import mix_sources
    df = spark.createDataFrame(
        [(i, f"s{s}") for i, s in rows], "doc_id long, source string")
    sizes = {f"s{s}": sum(1 for _, x in rows if x == s) for _, s in rows}
    out = mix_sources(df, "source", "doc_id", alpha=alpha,
                      target_rows=target).collect()
    kept = {}
    for r in out:
        kept[r["source"]] = kept.get(r["source"], 0) + 1
        assert r["mix_weight"] >= 1.0
    for s, n in kept.items():
        assert n <= sizes[s]
    again = mix_sources(df, "source", "doc_id", alpha=alpha,
                        target_rows=target).collect()
    assert sorted(r["doc_id"] for r in again) == \
        sorted(r["doc_id"] for r in out)


# ---------------------------------------------------------------------------
# corpus line dedup (Spark-backed)
# ---------------------------------------------------------------------------

line_texts = st.lists(
    st.sampled_from([
        "please accept all cookies to continue",     # likely-hot banner
        "subscribe to our newsletter for updates",   # second banner
        "unique content about topic alpha omega",
        "another body line with its own words here",
        "ok",                                        # under min_chars
        "",
    ]),
    min_size=0, max_size=5)


@SPARK_SETTINGS
@given(docs=st.lists(line_texts, min_size=1, max_size=8),
       max_df=st.integers(1, 3))
def test_dedupe_lines_invariants_fuzz(spark, docs, max_df):
    """Row conservation, short-line exemption, and idempotence for any
    line composition and frequency cap."""
    from eirepolitic_data_pipeline_spark.operators.dedupe import dedupe_lines
    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedupe_lines(df, max_df=max_df).collect()
    # 1. documents are never dropped
    assert {r["doc_id"] for r in out} == {i for i, _ in rows}
    by_id = {r["doc_id"]: r["text"] for r in out}
    # 2. short lines (< min_chars after trim) always survive, and every
    #    surviving line came from the original doc in original order
    for i, lines in enumerate(docs):
        out_lines = by_id[i].split("\n") if by_id[i] else []
        orig_iter = iter(lines)
        for ln in out_lines:
            for cand in orig_iter:
                if cand == ln:
                    break
            else:
                raise AssertionError(f"line {ln!r} out of order / invented")
        assert [l for l in lines if 0 < len(l.strip()) < 10
                ] == [l for l in out_lines if 0 < len(l.strip()) < 10]
    # 3. idempotent: a second pass changes nothing
    again = {r["doc_id"]: r["text"] for r in dedupe_lines(
        spark.createDataFrame(out, "doc_id long, text string"),
        max_df=max_df).collect()}
    assert again == by_id


@SPARK_SETTINGS
@given(docs=st.lists(st.text(alphabet="ab \t\nXY.9\xa0\u2028İß",
                             min_size=0, max_size=60),
                     min_size=1, max_size=6),
       n=st.integers(1, 4))
def test_shingle_counts_kernel_matches_catalyst_fuzz(spark, docs, n):
    r"""The Arrow occurrence kernel (profiling._shingle_counts, the
    heavy-hitter hot path) must agree byte-for-byte with the Catalyst
    word_shingles column form on arbitrary whitespace-edged unicode —
    tokenization (\xa0 and \u2028 must NOT split: both \s regexes are
    ASCII-only by design), lowercasing (İ/ß expand identically through
    Python str.lower and Catalyst lower — probed), <n-token whole-text
    shingles, and occurrence multiplicity (the same twin contract the
    dedupe kernels carry)."""
    from collections import Counter

    from eirepolitic_data_pipeline_spark.functions.text import word_shingles
    from eirepolitic_data_pipeline_spark.operators.profiling import (
        _shingle_counts)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id int, text string")
    catalyst = Counter(
        (r["doc_id"], r["ngram"])
        for r in df.select("doc_id",
                           F.explode(word_shingles("text", n)).alias("ngram"))
        .collect())
    kernel = Counter()
    for i, t in enumerate(docs):
        for ng, c in _shingle_counts(t, n).items():
            kernel[(i, ng)] += c
    assert kernel == catalyst


@SPARK_SETTINGS
@given(vecs=st.lists(
    st.lists(st.floats(min_value=-100, max_value=100,
                       allow_nan=False, allow_infinity=False,
                       width=32),
             min_size=0, max_size=8),
    min_size=1, max_size=5))
def test_quantize_int8_bounds_fuzz(spark, vecs):
    """For arbitrary finite vectors: codes stay in [-127, 127], the
    reconstruction error of every element stays within scale/2 (+1 ulp),
    and a zero/empty vector yields scale 0 with zero codes."""
    from eirepolitic_data_pipeline_spark.operators.vectors import (
        quantize_int8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id int, embedding array<double>")
    rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    for i, v in enumerate(vecs):
        r = rows[i]
        if not v or max(abs(x) for x in v) == 0.0:
            assert (r["scale"] is None if not v else r["scale"] == 0.0)
            assert r["qvec"] == [0] * len(v)
            continue
        scale = max(abs(x) for x in v) / 127.0
        assert all(-127 <= q <= 127 for q in r["qvec"])
        worst = max(abs(x - q * scale) for x, q in zip(v, r["qvec"]))
        assert worst <= scale / 2 + 1e-9 * scale


@SPARK_SETTINGS
@given(vecs=st.lists(
    st.tuples(st.floats(-1.0, 1.0, allow_nan=False, width=32),
              st.floats(-1.0, 1.0, allow_nan=False, width=32),
              st.floats(-1.0, 1.0, allow_nan=False, width=32)),
    min_size=2, max_size=14),
    threshold=st.sampled_from([0.8, 0.95, 0.99]),
    k=st.integers(1, 3))
def test_semdedup_matches_reference_closure_fuzz(spark, vecs, threshold, k):
    """semdedup's canonical assignment equals an independent pure-Python
    reference: run the SAME deterministic k-means assignment (via
    kmeans_assign — its cross-engine determinism is certified elsewhere),
    build the within-cluster >= threshold graph on 6-dp-rounded cosines,
    and take each node's component minimum by union-find. Any fuzzed
    vector set, any k, any threshold."""
    from eirepolitic_data_pipeline_spark.operators.vectors import (
        kmeans_assign, semdedup)

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    k = min(k, len(rows))  # kmeans_assign raises (by contract) on k > n
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: (r["cluster"], r["canonical_id"])
           for r in semdedup(df, k=k, iters=1, threshold=threshold,
                             max_cluster=None).collect()}
    clusters = {r["vec_id"]: r["cluster"]
                for r in kmeans_assign(df, k=k, iters=1).collect()}

    def cos6(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a)
        nb = sum(x * x for x in b)
        if na <= 0 or nb <= 0:
            return 0.0
        import math
        # mirror the operator's unit-vector recipe: normalize, then dot
        ua = [x / math.sqrt(na) for x in a]
        ub = [x / math.sqrt(nb) for x in b]
        return round(sum(x * y for x, y in zip(ua, ub)), 6)

    parent = {i: i for i, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    by_vec = dict(rows)
    ids = sorted(by_vec)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if clusters[a] == clusters[b] \
                    and cos6(by_vec[a], by_vec[b]) >= threshold:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    expected = {i: (clusters[i], find(i)) for i, _ in rows}
    assert out == expected


@SPARK_SETTINGS
@given(vals=st.lists(
    st.floats(min_value=-1e12, max_value=1e12,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=8))
def test_lit_array_sql_literal_bit_identical_fuzz(spark, vals):
    """_lit_array's one-round-trip SQL literal must evaluate to exactly
    the doubles the element-wise F.lit form produces: repr(float) is the
    shortest round-trip decimal, so parsing it back must be the identity
    on bits (the claim the kmeans/centroid expressions rely on)."""
    from pyspark.sql import functions as F
    from eirepolitic_data_pipeline_spark.operators.vectors import _lit_array
    df = spark.range(1)
    got = df.select(_lit_array(vals).alias("a")).first()["a"]
    want = df.select(F.array(*[F.lit(float(x)) for x in vals])
                     .alias("a")).first()["a"]
    import struct as _s
    assert [_s.pack("d", x) for x in got] == [_s.pack("d", x) for x in want]

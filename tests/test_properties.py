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

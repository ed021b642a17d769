"""Build an EDGE-CASE copy of a testdata dir for oracle parity checks:
the standard fixtures contain no NULL/blank documents and no duplicate
click timestamps, so Spark-vs-DuckDB divergences on those inputs are
invisible to the per-round correctness gate until a testdata regeneration
surfaces them as hash mismatches. This tool materializes exactly those
rows so the parity can be exercised on demand:

    python tools/make_edge_fixture.py [src_dir] [dst_dir]
    python tools/check_oracle.py <dst_dir>            # all 50 queries

Added rows:
- documents: doc_id 900001 (NULL text), 900002 ('' text), 900003
  (whitespace-only text) — exercises every tokenize/fingerprint/quality
  oracle's NULL/empty handling; 900004 (NULL lang) — exercises q55's
  NULL-source group contract (null-safe join, not a drop); 900005/900006
  (newline-trailed / tab-led near-dup pair) — exercises the phantom-token
  contract (split on \\s+ must drop edge empties) through the Arrow
  shingle kernels: with a strip(' ')-then-split tokenizer these two docs
  grow trailing-space / leading-space shingles and their Jaccard drops
  from 7/8 to 7/10, diverging from the oracle;
- events: three clicks sharing one (user_id, ts) with distinct event_ids
  plus one error after them — exercises q39's as-of tie rule (max
  event_id wins, which the oracle must pin explicitly: DuckDB's ASOF join
  has no deterministic tiebreak of its own);
- embeddings: vec_id 990001 (all-zero vector) — exercises the zero-norm
  cosine contract (engine scores 0.0; raw Spark would give NaN which
  desc-sorts FIRST, DuckDB's list_cosine_similarity gives -1.0 — three
  answers without the pin, r6); 990002/990003 (two exact copies of vec 10)
  — exercises the cosine-tie rank rule (neighbor_id tiebreak) in
  q26/q27/q65's top-k windows; 990004 (NULL embedding) — exercises NULL
  propagation across every embedding query (cosine-guard 0.0, NULL LSH
  buckets dropped by equi-joins, q72's 0/-128 digest sentinels, the
  kmeans/diversity NOT-NULL exclusion);
- orders: custkey 9990001 with NULL-bearing variant tuples (incl. an
  exact NULL-for-NULL duplicate) and custkey 9990002 with a clean exact
  duplicate — exercises q67's NULL-variant counting (Spark
  countDistinct(struct) vs DuckDB count(DISTINCT (a,b)) and
  dropDuplicates-vs-DISTINCT NULL equality);
- lineitem: one row with NULL l_returnflag (must fall to 'staon' via the
  ELSE branch on BOTH engines — NULL = 'A' is not true) and one with NULL
  l_orderkey (the NULL division group must survive q68's groupBys and
  modulo fall-throughs identically).
"""

from __future__ import annotations

import glob
import os
import shutil
import sys


def build(src: str, dst: str, spark=None) -> str:
    from pyspark.sql import SparkSession

    spark = spark or (SparkSession.builder.master("local[4]")
                      .config("spark.ui.enabled", "false").getOrCreate())
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from eirepolitic_data_pipeline_spark.workload.registry import t

    edited = ("documents.parquet", "events.parquet", "embeddings.parquet",
              "orders.parquet", "lineitem.parquet")
    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(src):
        if f.endswith(".parquet") and f not in edited:
            shutil.copy(os.path.join(src, f), os.path.join(dst, f))

    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    extra = spark.createDataFrame(
        [(900001, None, "en", "siteX", 0),
         (900002, "", "en", "siteX", 0),
         (900003, "   ", "en", "siteX", 3),
         # NULL lang: mix_sources must treat NULL as its own real group
         # (null-safe plan join), not drop the rows or merge them with a
         # source literally named '__null__'
         (900004, "plain english words for the null lang group", None,
          "siteX", 44),
         # \n-trailed / \t-led near-dup pair: the shingle kernels must
         # tokenize these identically to tokens()/the oracle (no phantom
         # '' tokens at whitespace edges) — the pair's Jaccard is 7/8
         # only when edge empties are dropped
         (900005, "shared parity sentence one two three four five six\n",
          "en", "siteX", 51),
         (900006,
          "\tshared parity sentence one two three four five six seven",
          "en", "siteX", 58)],
        schema=docs.schema)
    _write_single(docs.unionByName(extra), os.path.join(dst, "documents.parquet"))

    ev = t(spark, src, "events")
    cols = ["event_id", "user_id", "ts", "event_type", "value"]
    ts0 = ev.limit(1).collect()[0]["ts"]
    rows = [(9900001, 77777, ts0, "click", 1.11),
            (9900002, 77777, ts0, "click", 2.22),
            (9900099, 77777, ts0, "click", 9.99),
            (9900100, 77777, ts0, "error", 0.0)]
    extra_ev = spark.createDataFrame(rows, ev.select(*cols).schema)
    full = ev.select(*cols).unionByName(extra_ev)
    for c in [c for c in ev.columns if c not in cols]:
        full = full.join(ev.select(*cols, c), cols, "left")
    _write_single(full, os.path.join(dst, "events.parquet"))

    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    v10 = emb.filter("vec_id = 10").collect()[0]["embedding"]
    dim = len(v10)
    extra_emb = spark.createDataFrame(
        [(990001, [0.0] * dim, 7),   # zero-norm: cosine contract
         (990002, list(v10), 7),     # cosine-tie twins: rank tiebreak
         (990003, list(v10), 7),
         # NULL vector (r6): every embedding query must agree with its
         # oracle on NULL propagation — cosine 0.0 via the NULL-false
         # guard, LSH/IVF buckets NULL (dropped by the equi-join), q72
         # digests 0/-128 sentinels, kmeans/diversity exclusion
         (990004, None, 7),
         # EMPTY vector (r7, ADVICE): non-NULL zero-length array — must be
         # excluded by kmeans/diversity's size>0 guard (not silently
         # assigned via NULL-ordering), cosine 0.0 (zero-norm contract),
         # empty LSH bucket candidates only pair with other empties, q72
         # scale NULL / qvec [] / mse 0.0
         (990005, [], 7),
         # NULL-ELEMENT vector (r7b): a missing coordinate — DuckDB's
         # vector kernels RAISE on NULL-bearing lists, so every certified
         # embedding query excludes it on BOTH sides (engine:
         # _no_null_elements / kmeans exclusion; oracle: list_filter
         # clause). Unexcluded it silently minted int8 code 127, a
         # NULL-ordered k-means assignment, and duplicate IVF probes.
         (990006, [0.5] + [None] * (dim - 1), 7)],
        schema=emb.schema)
    _write_single(emb.unionByName(extra_emb),
                  os.path.join(dst, "embeddings.parquet"))

    orders = spark.read.parquet(os.path.join(src, "orders.parquet"))
    odate = orders.limit(1).collect()[0]["o_orderdate"]
    extra_o = spark.createDataFrame(
        # custkey 9990001: NULL-bearing variants — (NULL,'1-URGENT') twice
        # (exact dup must collapse under NULL-equality), (NULL, NULL), and
        # ('F', NULL): 3 distinct variants, all NULL-bearing
        [(99900001, 9990001, None, 1.0, odate, "1-URGENT"),
         (99900002, 9990001, None, 1.0, odate, "1-URGENT"),
         (99900003, 9990001, None, 1.0, odate, None),
         (99900004, 9990001, "F", 1.0, odate, None),
         # custkey 9990002: clean exact duplicate pair
         (99900005, 9990002, "O", 1.0, odate, "5-LOW"),
         (99900006, 9990002, "O", 1.0, odate, "5-LOW")],
        schema=orders.schema)
    _write_single(orders.unionByName(extra_o),
                  os.path.join(dst, "orders.parquet"))

    li = spark.read.parquet(os.path.join(src, "lineitem.parquet"))
    ldate = li.limit(1).collect()[0]["l_shipdate"]
    extra_li = spark.createDataFrame(
        # NULL returnflag (ELSE-branch parity) and NULL orderkey (NULL
        # division group through q68's groupBys / modulo fall-throughs)
        [(9990001, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, None, "O", ldate),
         (None, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "A", "F", ldate)],
        schema=li.schema)
    _write_single(li.unionByName(extra_li),
                  os.path.join(dst, "lineitem.parquet"))
    return dst


def _write_single(df, path: str) -> None:
    """One parquet FILE at ``path`` (the testdata layout DuckDB's oracle
    views glob), via a temp dir."""
    tmp = path + ".dir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    if os.path.exists(path):
        os.remove(path)
    shutil.move(part, path)
    shutil.rmtree(tmp)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_edge"
    print("wrote", build(src, dst))

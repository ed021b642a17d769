"""Downstream consumer builds — SURVEY §3.3.

``member_profile_metrics`` re-expresses the reference's per-member content
metrics job (`process/build_member_profile_metrics.py:67-150`): name-key
normalization, photo lookup, year filtering, NONE-label filtering, global
dense rank, top-issue argmax, distinct vote participation pct, wide output.

Inputs are string-typed compat CSV frames (blank == missing). Column names
for metric outputs are templated with the target year, matching the
reference's ``metric(name) -> f"{name}_{TARGET_YEAR}"``.

Scale: members/photos are tiny dims (broadcast); debates and votes are the
fact sides and reduce via single-shuffle groupBys before the final broadcast
joins — nothing driver-side except the global distinct-vote count (a scalar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import blank_as_null, normalize_name
from ..operators.ranking import argmax_per_group, dense_rank_in


def _first_column(df: DataFrame, candidates: list[str]) -> str | None:
    return next((c for c in candidates if c in df.columns), None)


def fuzzy_containment_join(left: DataFrame, right: DataFrame,
                           left_col: str, right_col: str,
                           payload_cols: list[str]) -> DataFrame:
    """J9 — fuzzy containment match (theta-join).

    Mirrors `instagram/renderer/context.py:26-34` (pick_constituency_image):
    both keys are name-normalized, and a right row matches when the keys are
    EQUAL or either key CONTAINS the other ("Dublin Bay North" matches image
    file "dublin bay north winter.png" and vice versa). The reference returns
    the first matching row in file order; here exact equality outranks
    containment and ties break on the normalized right key, so the pick is
    deterministic under any partitioning.

    Scale: BOTH key spaces must be bounded dimensions (reference: 43
    constituency images × constituency names). The match depends only on
    the normalized LEFT KEY, so the best match is resolved once per
    distinct key — a small distinct + aggregation — and attached back with
    a broadcast equi-join; left rows are never window-partitioned by a
    per-row id (nondeterministic under retries) and never fan out.
    Never call this with an unbounded right side: containment predicates
    can't hash-partition.
    """
    lk, rk = "__fuzzy_lk", "__fuzzy_rk"
    l_keyed = left.withColumn(lk, normalize_name(left_col))
    r_keyed = (right
               .select(normalize_name(right_col).alias(rk), *payload_cols)
               .filter(F.col(rk) != ""))
    cond = (F.col(lk) == F.col(rk)) | \
        F.col(lk).contains(F.col(rk)) | F.col(rk).contains(F.col(lk))
    keys = l_keyed.select(lk).filter(F.col(lk) != "").distinct()
    cand = keys.join(F.broadcast(r_keyed), cond, "inner")
    # exact equality outranks containment; ties break on the right key,
    # then on the payload itself — two right rows can NORMALIZE to the
    # same key ('Dublin Bay North.png' / 'DUBLIN-BAY-NORTH.png'), and a
    # non-total order would make min_by's pick partitioning-dependent
    rank = F.struct(
        F.when(F.col(lk) == F.col(rk), 0).otherwise(1).alias("r0"),
        F.col(rk).alias("r1"),
        *[F.col(c).alias(f"r{i + 2}") for i, c in enumerate(payload_cols)])
    best = (cand.groupBy(lk)
            .agg(F.min_by(F.struct(*payload_cols), rank).alias("__m"))
            .select(lk, *[F.col(f"__m.{c}").alias(c) for c in payload_cols]))
    return l_keyed.join(F.broadcast(best), lk, "left").drop(lk)


def join_by_code_or_name(base: DataFrame, source: DataFrame,
                         payload_cols: list[str],
                         name_col: str = "full_name") -> DataFrame:
    """J10 — multi-source coalescing join.

    Mirrors `instagram/renderer/context.py:37-80` / `build_member_profile_
    metrics.py:76-81`: a lookup dataset (photos, summaries) attaches by
    ``member_code`` when it carries that column, else falls back to the
    normalized full-name key; a source with neither key (or none of the
    payload columns) contributes null columns. First row per key wins, as in
    the reference's drop_duplicates-before-merge.

    ``base`` must already carry ``member_code`` and ``member_key``. The
    lookup side is a per-member dimension — broadcast, no shuffle on base.
    """
    def backfill(df: DataFrame) -> DataFrame:
        # Consistent output schema regardless of which payload columns the
        # source happened to ship: absent ones become typed null columns.
        for c in payload_cols:
            if c not in df.columns:
                df = df.withColumn(c, F.lit(None).cast("string"))
        return df

    payload = [c for c in payload_cols if c in source.columns]
    if not payload:
        return backfill(base)
    code_col = _first_column(source, ["member_code", "memberCode"])
    if code_col:
        lookup = (source
                  .select(F.col(code_col).cast("string").alias("member_code"),
                          *payload)
                  .dropDuplicates(["member_code"]))
        return backfill(base.join(F.broadcast(lookup), "member_code", "left"))
    source_name = _first_column(source, [name_col, "member_name"])
    if source_name:
        lookup = (source
                  .select(normalize_name(source_name).alias("member_key"),
                          *payload)
                  .dropDuplicates(["member_key"]))
        return backfill(base.join(F.broadcast(lookup), "member_key", "left"))
    return backfill(base)


def member_profile_metrics(members: DataFrame, votes: DataFrame,
                           photos: DataFrame, debates: DataFrame,
                           target_year: int) -> DataFrame:
    """One wide metrics row per member for the target year.

    Output columns: member_code, full_name, constituency, party, photo_url,
    top_issue_Y, top_issue_count_Y, vote_participation_pct_Y,
    distinct_votes_participated_Y, all_distinct_vote_ids_Y, speech_count_Y,
    speech_rank_Y (Y = target_year), sorted by speech count desc, name asc.
    """
    required = {"member_code", "full_name", "constituency", "party"}
    missing = sorted(required - set(members.columns))
    if missing:
        raise ValueError(f"Members input missing required columns: {missing}")

    def m(name: str) -> str:
        return f"{name}_{target_year}"

    base = members.withColumn("member_key", normalize_name("full_name"))

    # Photo enrich (J1/J10): first photo row per member wins; joins by
    # member_code when the photos set carries one, else falls back to the
    # normalized-name key (`context.py:37-80`).
    base = (join_by_code_or_name(base, photos, ["photo_url"])
            .withColumn("photo_url", F.coalesce("photo_url", F.lit(""))))

    # Speech metrics from classified debates (J3/W2/W3/A6).
    speaker_col = _first_column(debates, ["member_code", "speaker_member_code",
                                          "Speaker Member Code", "memberCode"])
    speaker_name_col = _first_column(debates, ["Speaker Name", "speaker_name",
                                               "member_name"])
    issue_col = _first_column(debates, ["PoliticalIssues", "political_issues",
                                        "issue", "Issue", "issue_label",
                                        "category", "label"])
    date_col = _first_column(debates, ["Debate Date", "date", "speech_date"])

    speech_metrics = None
    if issue_col and (speaker_col or speaker_name_col):
        working = debates
        if date_col:
            working = working.filter(
                F.year(blank_as_null(date_col).try_cast("date")) == target_year)
        if speaker_col:
            working = working.withColumn(
                "member_code", F.col(speaker_col).cast("string"))
        else:
            # Name-key join; ambiguous normalized names are dropped entirely
            # (pandas `drop_duplicates(keep=False)` ≈ groupBy-count == 1).
            lookup = (base.groupBy("member_key")
                      .agg(F.collect_list("member_code").alias("__codes"))
                      .filter(F.size("__codes") == 1)
                      .select("member_key",
                              F.element_at("__codes", 1).alias("member_code")))
            working = (working
                       .withColumn("member_key", normalize_name(speaker_name_col))
                       .join(F.broadcast(lookup), "member_key", "inner"))
        issue = F.trim(F.coalesce(F.col(issue_col).cast("string"), F.lit("")))
        working = (working
                   .withColumn("__issue", issue)
                   .filter((F.trim("member_code") != "")
                           & (F.upper("__issue") != "NONE")
                           & (F.col("__issue") != "")))
        # dense_rank needs no unique tiebreak: equal counts SHARE a rank
        # by definition, which is already deterministic
        counts = dense_rank_in(
            working.groupBy("member_code")
            .agg(F.count(F.lit(1)).alias(m("speech_count"))),
            [], [F.col(m("speech_count")).desc()], m("speech_rank"))
        issues = (working.groupBy("member_code", "__issue")
                  .agg(F.count(F.lit(1)).alias(m("top_issue_count"))))
        top_issue = argmax_per_group(
            issues, ["member_code"],
            [F.col(m("top_issue_count")).desc(), F.col("__issue")]) \
            .select("member_code", F.col("__issue").alias(m("top_issue")),
                    m("top_issue_count"))
        speech_metrics = counts.join(top_issue, "member_code", "left")

    # Vote participation: distinct (member, vote) pairs vs global distinct.
    member_col = _first_column(votes, ["memberCode", "member_code"])
    vote_id_col = _first_column(votes, ["unique_vote_id", "division_id", "vote_id"])
    vote_date_col = _first_column(votes, ["date", "division_date"])
    vote_metrics, total_vote_ids = None, 0
    if member_col and vote_id_col:
        working = votes
        if vote_date_col:
            working = working.filter(
                F.year(blank_as_null(vote_date_col).try_cast("date")) == target_year)
        # the GLOBAL denominator counts every division that occurred —
        # including ones recorded only with blank member codes; computing
        # it after the member dropna inflated every member's pct
        total_vote_ids = (working
                          .select(blank_as_null(vote_id_col).alias("__vote_id"))
                          .dropna().distinct().count())
        pairs = (working
                 .select(blank_as_null(member_col).alias("member_code"),
                         blank_as_null(vote_id_col).alias("__vote_id"))
                 .dropna().dropDuplicates())
        vote_metrics = pairs.groupBy("member_code").agg(
            F.count(F.lit(1)).alias(m("distinct_votes_participated")))
        pct = (F.round(F.col(m("distinct_votes_participated"))
                       / total_vote_ids * 100).cast("int")
               if total_vote_ids > 0 else F.lit(0))
        vote_metrics = vote_metrics.withColumn(m("vote_participation_pct"), pct)

    out = base
    if speech_metrics is not None:
        out = out.join(F.broadcast(speech_metrics), "member_code", "left")
    if vote_metrics is not None:
        out = out.join(F.broadcast(vote_metrics), "member_code", "left")

    int_cols = [m("speech_count"), m("speech_rank"), m("top_issue_count"),
                m("vote_participation_pct"), m("distinct_votes_participated")]
    for c in int_cols:
        src = F.col(c) if c in out.columns else F.lit(None)
        out = out.withColumn(c, F.coalesce(src.try_cast("int"), F.lit(0)))
    top_issue_src = (F.col(m("top_issue")) if m("top_issue") in out.columns
                     else F.lit(None))
    out = (out
           .withColumn(m("top_issue"),
                       F.coalesce(top_issue_src.cast("string"), F.lit("")))
           .withColumn(m("all_distinct_vote_ids"), F.lit(total_vote_ids)))

    keep = ["member_code", "full_name", "constituency", "party", "photo_url",
            m("top_issue"), m("top_issue_count"), m("vote_participation_pct"),
            m("distinct_votes_participated"), m("all_distinct_vote_ids"),
            m("speech_count"), m("speech_rank")]
    return out.select(*keep).orderBy(F.col(m("speech_count")).desc(),
                                     F.col("full_name"))

"""Review-only comparison reports (plans/reports.py): cutover pairs + the
member-profile trial summary, with the reference's status semantics."""

from __future__ import annotations

from eirepolitic_data_pipeline_spark.plans.reports import (
    CUTOVER_COLUMNS,
    ComparisonPair,
    cutover_comparison_report,
    member_profile_trial_report,
    render_markdown_report,
)


def _frames(spark):
    legacy = spark.createDataFrame(
        [("m1", "A"), ("m2", "B"), ("m3", "C"), ("", "blank"), ("m3", "dup")],
        "member_code string, x string")
    unified = spark.createDataFrame(
        [("m2", "B2", "e1"), ("m3", "C2", "e2"), ("m4", "D", "e3")],
        "member_code string, y string, z string")
    return legacy, unified


def test_cutover_report_key_algebra_and_status(spark):
    legacy, unified = _frames(spark)
    tables = {"legacy_members": legacy, "unified_members": unified,
              "unified_empty": unified.limit(0)}
    pairs = [
        ComparisonPair("members", "legacy_members", "unified_members",
                       "member_code", "member_code"),
        ComparisonPair("missing_legacy", "nope", "unified_members",
                       "member_code", "member_code"),
        ComparisonPair("empty_unified", "legacy_members", "unified_empty",
                       "member_code", "member_code"),
        ComparisonPair("missing_unified", "legacy_members", "nope2",
                       "member_code", "member_code"),
    ]
    rep = cutover_comparison_report(spark, pairs, tables.get)
    assert rep.columns == CUTOVER_COLUMNS
    rows = {r["comparison_name"]: r for r in rep.collect()}
    m = rows["members"]
    # distinct nonblank keys: legacy {m1,m2,m3}, unified {m2,m3,m4}
    assert m["status"] == "pass"
    assert (m["matched_key_count"], m["legacy_only_key_count"],
            m["unified_only_key_count"]) == ("2", "1", "1")
    assert m["legacy_rows"] == "5" and m["unified_rows"] == "3"
    assert m["legacy_columns"] == "2" and m["unified_columns"] == "3"
    # coverage: 4 of 5 legacy rows have a nonblank key
    assert m["legacy_join_coverage_pct"] == "80.00"
    assert m["unified_join_coverage_pct"] == "100.00"
    assert m["comparison_id"].startswith("cmp:") and \
        len(m["comparison_id"]) == 4 + 24
    # status downgrades per the reference: missing legacy = warn,
    # empty/missing unified = fail; unjoinable pairs leave blanks
    assert rows["missing_legacy"]["status"] == "warn"
    assert rows["missing_legacy"]["matched_key_count"] == ""
    assert rows["empty_unified"]["status"] == "fail"
    assert rows["missing_unified"]["status"] == "fail"
    assert rows["missing_unified"]["unified_rows"] == "0"
    # reference precedence: missing legacy warns EVEN IF unified is also
    # missing/empty (the warn assignment follows the pass/fail decision)
    both_gone = cutover_comparison_report(
        spark, [ComparisonPair("neither", "nope_l", "nope_u",
                               "member_code", "member_code")],
        tables.get).collect()[0]
    assert both_gone["status"] == "warn"
    # deterministic id: same pair → same id
    rep2 = cutover_comparison_report(spark, pairs[:1], tables.get)
    assert rep2.collect()[0]["comparison_id"] == m["comparison_id"]


def test_trial_report_checks(spark):
    legacy, trial = _frames(spark)
    trial = trial.withColumnRenamed("z", "x")  # one common non-key column
    rep = member_profile_trial_report(spark, legacy, trial)
    rows = {r["check_name"]: r for r in rep.collect()}
    assert len(rows) == 8
    assert rows["legacy_rows"]["legacy_value"] == "5"
    assert rows["trial_rows"]["status"] == "pass"
    assert rows["trial_rows"]["trial_value"] == "3"
    assert rows["legacy_member_count"]["legacy_value"] == "3"
    assert rows["trial_member_count"]["trial_value"] == "3"
    assert rows["matched_member_count"]["trial_value"] == "2"
    assert rows["matched_member_count"]["status"] == "pass"
    assert rows["trial_only_member_count"]["trial_value"] == "1"
    assert rows["legacy_only_member_count"]["legacy_value"] == "1"
    assert rows["common_column_count"]["message"] == "member_code,x"

    # empty trial → fail statuses, zero overlap warns
    empty = trial.limit(0)
    rows2 = {r["check_name"]: r for r in
             member_profile_trial_report(spark, legacy, empty).collect()}
    assert rows2["trial_rows"]["status"] == "fail"
    assert rows2["trial_member_count"]["status"] == "fail"
    assert rows2["matched_member_count"]["status"] == "warn"


def test_render_markdown_report(spark):
    legacy, trial = _frames(spark)
    rep = member_profile_trial_report(spark, legacy, trial)
    md = render_markdown_report("Trial", rep, preamble="Review-only.")
    lines = md.splitlines()
    assert lines[0] == "# Trial" and "Review-only." in md
    assert lines[4].startswith("| check_name | status |")
    assert len([ln for ln in lines if ln.startswith("| ")]) == 2 + 8
    # escaping: pipes and newlines cannot break the table
    tricky = spark.createDataFrame([("a|b\nc",)], "v string")
    md2 = render_markdown_report("T", tricky)
    assert "a\\|b c" in md2

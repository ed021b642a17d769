"""U3 batch JSON scoring: id-set validation, repair loop, batching."""

from __future__ import annotations

import json

import pytest

from eirepolitic_data_pipeline_spark.enrich.batch_scoring import (
    BatchScoreConfig,
    BatchScoreRunner,
    build_scoring_prompt,
    extract_json_payload,
    parse_scores,
)


def _candidates(prompt: str) -> list[dict]:
    # raw_decode: repair prompts append error text after the candidates JSON
    tail = prompt.split("Candidates:\n", 1)[1]
    return json.JSONDecoder().raw_decode(tail)[0]


# ---------------------------------------------------------------------------
# pure parsing / validation
# ---------------------------------------------------------------------------

def test_extract_json_payload_variants():
    assert extract_json_payload('[{"a": 1}]') == [{"a": 1}]
    assert extract_json_payload('noise [{"a": 1}] trailing') == [{"a": 1}]
    assert extract_json_payload('text {"a": 1} more') == {"a": 1}
    with pytest.raises(ValueError):
        extract_json_payload("no json here")


def test_parse_scores_clamps_and_accepts_wrapped():
    text = '{"scores": [{"candidate_id": "a", "score": 400},' \
           ' {"candidate_id": "b", "score": -3}]}'
    assert parse_scores(text, ["a", "b"]) == {"a": 100, "b": 1}


def test_parse_scores_rejects_missing_and_extra_ids():
    with pytest.raises(ValueError, match="Missing"):
        parse_scores('[{"candidate_id": "a", "score": 5}]', ["a", "b"])
    with pytest.raises(ValueError, match="Extras"):
        parse_scores('[{"candidate_id": "a", "score": 5},'
                     ' {"candidate_id": "zz", "score": 5}]', ["a"])


def test_score_batch_raises_after_retry_budget():
    cfg = BatchScoreConfig(instructions="Score.", max_retries=3)
    runner = BatchScoreRunner(cfg, client_factory=lambda: lambda p: "junk")
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        runner.score_batch(lambda p: "junk",
                           [{"candidate_id": "a", "sentence": "x"}])


def test_repair_prompt_carries_error():
    calls = []

    def client(prompt):
        calls.append(prompt)
        cands = _candidates(prompt)
        if len(calls) == 1:  # drop one id -> invalid
            cands = cands[:-1]
        return json.dumps(
            [{"candidate_id": c["candidate_id"], "score": 10} for c in cands])

    cfg = BatchScoreConfig(instructions="Score.")
    runner = BatchScoreRunner(cfg, client_factory=lambda: client)
    records = [{"candidate_id": "a", "sentence": "x"},
               {"candidate_id": "b", "sentence": "y"}]
    assert runner.score_batch(client, records) == {"a": 10, "b": 10}
    assert len(calls) == 2
    assert "invalid because" in calls[1] and "Missing" in calls[1]


# ---------------------------------------------------------------------------
# Spark end-to-end
# ---------------------------------------------------------------------------

def test_batch_scoring_end_to_end_with_repair(spark):
    # Factory defined in-test so cloudpickle ships it by value. The fake
    # scores len(sentence); its FIRST answer per task omits the last id to
    # exercise the repair loop on the executor.
    def factory():
        state = {"first": True}

        def cands_of(prompt):
            tail = prompt.split("Candidates:\n", 1)[1]
            return json.JSONDecoder().raw_decode(tail)[0]

        def client(prompt):
            cands = cands_of(prompt)
            if state["first"] and "invalid because" not in prompt:
                state["first"] = False
                cands = cands[:-1]
            return json.dumps([
                {"candidate_id": c["candidate_id"],
                 "score": len(c["sentence"])} for c in cands])
        return client

    cfg = BatchScoreConfig(instructions="Score ridiculousness 1-100.")
    runner = BatchScoreRunner(cfg, client_factory=factory)
    df = spark.createDataFrame(
        [(f"id{i}", "w" * (i + 1)) for i in range(7)],
        "candidate_id string, sentence string").repartition(1)
    out = {r["candidate_id"]: r["score"] for r in runner.run(df).collect()}
    assert out == {f"id{i}": i + 1 for i in range(7)}


def test_batch_scoring_respects_batch_size(spark):
    # 45 rows in one partition with batch_size=20 must arrive as prompts of
    # 20/20/5 candidates — the fake fails loudly on an oversized batch.
    def factory():
        def client(prompt):
            tail = prompt.split("Candidates:\n", 1)[1]
            cands = json.JSONDecoder().raw_decode(tail)[0]
            assert len(cands) <= 20, "batch size exceeded"
            return json.dumps([
                {"candidate_id": c["candidate_id"], "score": 50}
                for c in cands])
        return client

    cfg = BatchScoreConfig(instructions="Score.", batch_size=20)
    runner = BatchScoreRunner(cfg, client_factory=factory)
    df = spark.createDataFrame(
        [(f"c{i:03d}", f"sentence {i}") for i in range(45)],
        "candidate_id string, sentence string").repartition(1)
    rows = runner.run(df).collect()
    assert len(rows) == 45 and all(r["score"] == 50 for r in rows)


def test_build_scoring_prompt_contract():
    p = build_scoring_prompt(
        [{"candidate_id": "a", "sentence": "hello"}], "Score these.")
    assert "Score these." in p
    assert "Return every candidate_id exactly once" in p
    assert '"candidate_id": "a"' in p and '"sentence": "hello"' in p

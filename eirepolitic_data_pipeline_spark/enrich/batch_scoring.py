"""U3 — batch JSON scoring over a DataFrame column (SURVEY §2.11).

Reference contract (`process/ridiculous_sentences_weekly.py:296-403`):
rows are scored in batches of N (reference BATCH_SIZE=20); each batch is
rendered into ONE prompt listing ``(candidate_id, sentence)`` pairs; the
model must return a JSON array of ``{candidate_id, score}`` covering the
id set EXACTLY — any missing or extra id fails validation; scores are
clamped to [1, 100]; an invalid payload triggers a bounded repair loop that
re-prompts with the parse error appended; exhausted retries raise.

Spark shape: ``mapInPandas`` — the model client is built once per task,
each Arrow batch is chunked into score batches driver-free, so the stage
scales out with partitions and the resume anti-join (LLMColumnRunner) can
front it. The retry sleep lives in the injected client factory (a Spark
task should not hard-code wall-clock backoff; the reference's
``time.sleep(1.5*attempt)`` is an API-rate concern that belongs to the
client).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterator, List, Sequence

from pyspark.sql import DataFrame


def extract_json_payload(raw: str) -> Any:
    """Tolerant JSON extraction (reference `:270-294`): direct parse, else
    the outermost ``[...]`` slice, else the outermost ``{...}`` slice."""
    raw = raw.strip()
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        pass
    left, right = raw.find("["), raw.rfind("]")
    if left != -1 and right > left:
        return json.loads(raw[left:right + 1])
    left, right = raw.find("{"), raw.rfind("}")
    if left != -1 and right > left:
        return json.loads(raw[left:right + 1])
    raise ValueError("Could not locate JSON payload in model output.")


def parse_scores(text: str, expected_ids: Sequence[str],
                 lo: int = 1, hi: int = 100,
                 id_key: str = "candidate_id") -> Dict[str, int]:
    """Strict id-set validation (reference `:333-358`): every expected id
    exactly once, nothing extra; non-dict items and unparseable scores are
    skipped (and then surface as missing ids); scores clamp to [lo, hi].

    ``id_key`` must match the key ``build_scoring_prompt`` instructed the
    model to use — the prompt parameterizes it, so the parser must too
    (a config with ``id_col != 'candidate_id'`` could otherwise never
    validate a single response)."""
    data = extract_json_payload(text)
    items = data["scores"] if isinstance(data, dict) and "scores" in data else data
    if not isinstance(items, list):
        raise ValueError("JSON payload is not a list.")
    scores: Dict[str, int] = {}
    expected_set = set(expected_ids)
    seen: set = set()
    duplicates: List[str] = []
    for item in items:
        if not isinstance(item, dict):
            continue
        cid = str(item.get(id_key, "")).strip()
        if not cid:
            continue
        # duplicate check BEFORE score parsing: EXACTLY once means once —
        # an id repeated with an unparseable second score is just as
        # ambiguous as one repeated with a conflicting number, and both
        # must fail validation and trigger the repair re-prompt
        if cid in seen:
            duplicates.append(cid)
            continue
        seen.add(cid)
        try:
            score = int(item.get("score"))
        except (TypeError, ValueError):
            continue
        scores[cid] = max(lo, min(hi, score))
    missing = [c for c in expected_ids if c not in scores]
    extras = [c for c in scores if c not in expected_set]
    if missing or extras or duplicates:
        raise ValueError(
            f"Invalid score payload. Missing={missing[:5]} "
            f"Extras={extras[:5]} Duplicates={duplicates[:5]}")
    return scores


def build_scoring_prompt(batch: List[Dict[str, str]], instructions: str,
                         id_key: str = "candidate_id",
                         text_key: str = "sentence") -> str:
    """One prompt per batch: task instructions + the JSON contract + the
    candidates as a JSON list (reference `:296-331`)."""
    payload = json.dumps(
        [{id_key: b[id_key], text_key: b[text_key]} for b in batch],
        ensure_ascii=False, indent=2)
    return (
        f"{instructions.strip()}\n\n"
        "Important rules:\n"
        f"- Return every {id_key} exactly once.\n"
        "- Return ONLY valid JSON: an array of objects shaped like\n"
        f'  [{{"{id_key}": "abc", "score": 73}}]\n\n'
        f"Candidates:\n{payload}"
    )


@dataclass(frozen=True)
class BatchScoreConfig:
    instructions: str
    id_col: str = "candidate_id"
    text_col: str = "sentence"
    output_col: str = "score"
    batch_size: int = 20          # reference BATCH_SIZE
    max_retries: int = 3          # reference MAX_RETRIES
    lo: int = 1
    hi: int = 100


@dataclass
class BatchScoreRunner:
    """Scores ``df[text_col]`` in id-validated JSON batches.

    ``client_factory() -> callable(prompt) -> str`` is constructed once per
    Spark task (never pickled). A batch whose payload stays invalid after
    ``max_retries`` attempts raises — failing the task, which is the
    reference's behavior (`:381-403`) and the right call in a pipeline: a
    silently unscored batch poisons downstream top-N selection.
    """

    config: BatchScoreConfig
    client_factory: Callable[[], Callable[[str], str]]

    def score_batch(self, client: Callable[[str], str],
                    records: List[Dict[str, str]]) -> Dict[str, int]:
        cfg = self.config
        # one prompt entry per id: duplicate input ids would make a model
        # that answers every listed candidate fail parse_scores'
        # exactly-once validation on EVERY retry (the re-prompt still
        # lists the id twice) — dedupe keeping the first occurrence; the
        # caller's score lookup assigns the one score to every same-id row
        uniq: Dict[str, Dict[str, str]] = {}
        for r in records:
            uniq.setdefault(r[cfg.id_col], r)
        records = list(uniq.values())
        expected = [r[cfg.id_col] for r in records]
        prompt = build_scoring_prompt(records, cfg.instructions,
                                      cfg.id_col, cfg.text_col)
        attempt_prompt = prompt
        last_err: Exception = RuntimeError("no attempts made")
        for _ in range(cfg.max_retries):
            try:
                return parse_scores(client(attempt_prompt), expected,
                                    cfg.lo, cfg.hi, id_key=cfg.id_col)
            except (ValueError, json.JSONDecodeError, KeyError) as e:
                last_err = e
                attempt_prompt = (
                    prompt + f"\n\nThe previous output was invalid because:"
                    f" {e}\nReturn only corrected valid JSON.")
        raise RuntimeError(
            f"Failed to score batch after {cfg.max_retries} attempts:"
            f" {last_err}")

    def run(self, df: DataFrame) -> DataFrame:
        """Append ``output_col`` (int) to ``df`` via mapInPandas."""
        cfg = self.config
        runner = self

        def score_partitions(batches: Iterator) -> Iterator:
            client = runner.client_factory()
            for pdf in batches:
                out = pdf.copy()
                scores: Dict[str, int] = {}
                records = out[[cfg.id_col, cfg.text_col]].astype(str) \
                    .to_dict(orient="records")
                for start in range(0, len(records), cfg.batch_size):
                    scores.update(runner.score_batch(
                        client, records[start:start + cfg.batch_size]))
                out[cfg.output_col] = [
                    scores[str(i)] for i in out[cfg.id_col]]
                yield out

        schema = ", ".join(f"{name} {dtype}" for name, dtype in df.dtypes) \
            + f", {cfg.output_col} int"
        return df.mapInPandas(score_partitions, schema=schema)

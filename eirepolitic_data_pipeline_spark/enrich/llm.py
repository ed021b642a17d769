"""Config-driven LLM column enrichment — SURVEY §2.11 U1-U4
(`process/llm_table_runner.py:146-449`, `speech_issue_classifier.py`).

Reference semantics preserved, Spark-shaped:
- a TEMPLATE with column variables produces one output column;
- validation (allowed labels / regex / max words) with bounded repair
  retries; failures → fallback value (reference NONE);
- **resume**: rows whose output already exists are anti-joined away before
  the expensive stage (reference resume-map, `llm_table_runner.py:371-394`)
  — at 100 TB this is the difference between re-running a corpus and
  topping it up;
- execution is ``mapInPandas``: the model client is constructed per
  partition (never pickled), called per Arrow batch.

The client is injected as a factory returning ``callable(prompt) -> str`` —
tests use deterministic fakes; production wires a real API client with
rate limiting inside the factory.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Iterator, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedupe import dedupe_total_order


@dataclass(frozen=True)
class LLMColumnConfig:
    """One enrichment column (reference YAML job config)."""

    output_col: str
    template: str                       # "...{col_a}...{col_b}..." ≤5 vars
    input_cols: Sequence[str]
    allowed_values: Optional[Sequence[str]] = None
    max_words: Optional[int] = None
    validate_regex: Optional[str] = None
    max_repair_iters: int = 2
    fallback: str = "NONE"
    id_col: str = "id"
    overwrite: bool = False             # False = fill-missing-only mode
    # U4 (`llm_table_runner.py:146-239`, `members_background_summarizer.py`):
    # tool names forwarded to the client (reference: use_web_search →
    # tools=[{"type": "web_search"}], tool_choice auto); answers from
    # web-enabled calls carry inline [n] citations, stripped when asked.
    tools: Optional[Sequence[str]] = None
    strip_citations: bool = False

    def validate(self, answer: str) -> bool:
        a = answer.strip()
        if not a:
            return False
        if self.allowed_values is not None and a not in self.allowed_values:
            return False
        if self.max_words is not None and len(a.split()) > self.max_words:
            return False
        if self.validate_regex is not None and not re.fullmatch(self.validate_regex, a):
            return False
        return True


@dataclass
class LLMColumnRunner:
    config: LLMColumnConfig
    client_factory: Callable[[], Callable[[str], str]]

    def _enrich_partitions(self, cols: Sequence[str]):
        cfg = self.config
        factory = self.client_factory

        def run(batches: Iterator) -> Iterator:
            client = factory()  # one client per partition/task

            def ask(prompt: str) -> str:
                raw = (client(prompt, tools=list(cfg.tools)) if cfg.tools
                       else client(prompt))
                if cfg.strip_citations:
                    from ..functions.scalar import strip_citations_py
                    raw = strip_citations_py(raw)
                return raw

            for pdf in batches:
                answers = []
                for _, row in pdf.iterrows():
                    prompt = cfg.template.format(**{c: row[c] for c in cfg.input_cols})
                    answer = ask(prompt)
                    iters = 0
                    while not cfg.validate(answer) and iters < cfg.max_repair_iters:
                        answer = ask(
                            f"Your previous answer {answer!r} was invalid. "
                            f"{prompt}")
                        iters += 1
                    answers.append(answer.strip() if cfg.validate(answer)
                                   else cfg.fallback)
                out = pdf[list(cols)].copy()
                out[cfg.output_col] = answers
                yield out

        return run

    def run(self, df: DataFrame,
            existing: Optional[DataFrame] = None) -> DataFrame:
        """Enrich ``df`` with the configured column; rows already present in
        ``existing`` (same id, non-null output) are reused, not recomputed.

        Resume is KEYED on ``id_col``: rows with a null id cannot join an
        answer back, so they bypass the LLM and carry ``cfg.fallback``
        instead of silently vanishing (a null key never matches any join)."""
        cfg = self.config
        null_rows = df.filter(F.col(cfg.id_col).isNull()) \
            .withColumn(cfg.output_col, F.lit(cfg.fallback).cast("string"))
        df = df.filter(F.col(cfg.id_col).isNotNull())
        todo = df
        done = None
        if existing is not None and not cfg.overwrite:
            # one answer per id even if `existing` accumulated duplicates
            # (unioned prior runs): max is an arbitrary-but-deterministic
            # pick, so the reused join cannot multiply rows
            done = (existing.filter(F.col(cfg.output_col).isNotNull())
                    .groupBy(cfg.id_col)
                    .agg(F.max(cfg.output_col).alias(cfg.output_col)))
            todo = df.join(done.select(cfg.id_col), cfg.id_col, "left_anti")

        in_cols = [cfg.id_col, *[c for c in cfg.input_cols if c != cfg.id_col]]
        schema = ", ".join(
            [f"{c} {dict(df.dtypes)[c]}" for c in in_cols]
            + [f"{cfg.output_col} string"])
        # one REQUEST (and so one answer) per id, even when df itself holds
        # duplicate ids: without this, k same-id rows each get enriched and
        # the join back fans out to k*k rows with answers cross-assigned
        # between payloads. Deterministic pick (total order over the input
        # columns), same one-answer-per-id contract as the `done` reuse.
        req = dedupe_total_order(todo.select(*in_cols), [cfg.id_col])
        enriched = req.mapInPandas(
            self._enrich_partitions(in_cols), schema=schema)
        out = df.join(enriched.select(cfg.id_col, cfg.output_col), cfg.id_col, "left")
        if done is not None:
            reused = df.join(done, cfg.id_col, "inner")
            out = out.filter(F.col(cfg.output_col).isNotNull()).unionByName(reused)
        return out.unionByName(null_rows)

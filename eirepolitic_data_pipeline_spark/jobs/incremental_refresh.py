"""Incremental rollup refresh — the end-to-end wiring of the incremental
operators into the engine's batch/catalog lifecycle.

Replaces the recompute-everything refresh for additive rollups: each run
aggregates ONLY the new window's facts, merges them into the persisted
rollup (``operators.incremental.incremental_additive``), keeps distinct
counts exact-enough via mergeable HLL sketches
(``operators.sketches``), and lands the result through the normal
candidate-batch → promote flow, so rollback and batch immutability apply
unchanged. Cost per refresh: O(delta + rollup), never O(history).

The overlap-window re-delivery problem (the same fact arriving in two
consecutive windows) is handled BEFORE aggregation: the delta is
anti-joined against the processed-id log — the same resume-map pattern the
LLM runner uses — so a fact is counted exactly once however many windows
re-deliver it.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import nonblank
from ..io.catalog import BatchCatalog, CatalogError, is_path_not_found
from ..operators.incremental import incremental_additive
from ..operators.sketches import hll_estimate, hll_merge, hll_rollup

PROCESSED_SUFFIX = "__processed_ids"
SKETCH_SUFFIX = "__distinct_sketch"


@dataclass
class IncrementalRollup:
    """One maintained rollup: additive metrics + optional HLL distinct."""

    catalog: BatchCatalog
    spark: SparkSession
    table: str
    keys: Sequence[str]
    fact_id_col: str
    count_cols: Sequence[str]          # additive metric columns of agg_fn
    distinct_col: Optional[str] = None  # fact column for approx-distinct
    # event-time column carried into the processed-id log so it can be
    # PRUNED to the re-delivery horizon (the batch analog of watermark
    # state eviction): without pruning the log grows O(all facts ever);
    # with it, O(facts inside the overlap window).
    fact_ts_col: Optional[str] = None
    # refresh() refuses to run while a COMPLETED but unpromoted refresh
    # batch for this rollup exists in the catalog, because prev/seen
    # resolve through the production pointer — an unpromoted window would
    # silently vanish from the next rollup. The check reads the batch
    # manifests on disk (catalog.unpromoted_batches_containing), NOT
    # process memory, so it survives the exact crash-between-refresh-and-
    # promote scenario it exists to catch. The rollup table is written
    # LAST, so its presence in a manifest implies the whole batch
    # (id log + sketch + rollup) completed and is promotable.

    def _read_or_none(self, table: str) -> Optional[DataFrame]:
        """Persisted state, or None when it genuinely does not exist yet.
        Only the two absence cases return None — no production pointer
        (CatalogError) and a missing table path (AnalysisException with the
        PATH_NOT_FOUND condition); any other read failure propagates, since
        treating a transient error as "no history" would silently reset the
        rollup to this window's delta."""
        try:
            return self.catalog.read_table(self.spark, table)
        except CatalogError:
            return None
        except AnalysisException as e:
            if is_path_not_found(e):
                return None
            raise

    def refresh(self, delta_facts: DataFrame, agg_fn, batch_id: str,
                horizon: Optional[str] = None) -> DataFrame:
        """Apply one refresh window. ``agg_fn(facts)`` must produce the
        rollup grain (keys + count_cols). Writes rollup + sketch +
        processed-id log into the candidate batch; caller promotes BEFORE
        the next refresh (enforced durably via the catalog manifests).

        ``horizon`` (requires ``fact_ts_col``): drop processed-id entries
        whose event time precedes it — ids older than the earliest possible
        re-delivery window can never be re-delivered, so keeping them only
        bloats the log. Facts older than a pruned horizon that DO arrive
        again would double-count; pick the horizon = the oldest window
        start the orchestration can still issue (cf. jobs/refresh.py's
        35-day weekly lookback)."""
        # validate EVERYTHING before the first write: a partial candidate
        # batch poisons same-batch retries (duplicate-table refusals)
        if horizon is not None and self.fact_ts_col is None:
            raise ValueError("horizon pruning requires fact_ts_col")
        stale = self.catalog.unpromoted_batches_containing(self.table)
        if stale:
            raise CatalogError(
                f"unpromoted refresh batch(es) {stale!r} contain "
                f"{self.table!r}; running another refresh would resolve "
                "prev/seen through the production pointer and silently drop "
                "those windows from the rollup. Promote the stale batch "
                "(it completed — the rollup table is written last) or "
                "delete its directory to abandon the window.")

        prev = self._read_or_none(self.table)
        if prev is not None and "approx_distinct" in prev.columns:
            # the persisted estimate is stale by construction (re-derived
            # from the merged sketch below); drop it even when distinct_col
            # was turned OFF, or the passthrough merge would republish a
            # frozen estimate forever
            prev = prev.drop("approx_distinct")
        seen = self._read_or_none(self.table + PROCESSED_SUFFIX)

        # exactly-once per fact: dedupe WITHIN the window (a source can
        # deliver one fact twice in a single fetch) and against prior
        # windows (overlap re-delivery). Persisted because three written
        # outputs consume this frame — without it the delta scan and
        # anti-join would re-execute per output, and a non-deterministic
        # source could make rollup, sketch and id log disagree.
        #
        # A NULL id cannot participate in that contract in either
        # direction: dropDuplicates would collapse DISTINCT null-id facts
        # within the window (undercount) while the plain-equality
        # anti-join never matches NULL (the same fact re-counted on every
        # overlapping re-delivery). Refuse loudly instead of silently
        # corrupting the rollup both ways.
        if delta_facts.filter(
                F.col(self.fact_id_col).isNull()).limit(1).count():
            raise ValueError(
                f"delta contains NULL {self.fact_id_col!r} value(s): the "
                "fact id is the exactly-once key, so NULL ids can neither "
                "be deduplicated within a window nor tracked across "
                "windows. Derive a surrogate id (e.g. stable_record_hash) "
                "before refresh()")
        new_facts = delta_facts.dropDuplicates([self.fact_id_col])
        if seen is not None:
            new_facts = new_facts.join(seen.select(self.fact_id_col),
                                       self.fact_id_col, "left_anti")
        new_facts = new_facts.persist()
        try:
            delta_agg = agg_fn(new_facts)
            rollup = (incremental_additive(prev, delta_agg, self.keys,
                                           self.count_cols)
                      if prev is not None else delta_agg)

            out = rollup
            if self.distinct_col is not None:
                sk = hll_rollup(new_facts, self.keys, self.distinct_col)
                prev_sk = self._read_or_none(self.table + SKETCH_SUFFIX)
                if prev is not None and prev_sk is None:
                    # distinct_col turned ON mid-life: the rollup has
                    # history but no sketch covers it, so the merged
                    # estimate would count only post-enable facts while
                    # being published as if it covered everything.
                    raise CatalogError(
                        f"{self.table!r} has persisted history but no "
                        f"{self.table + SKETCH_SUFFIX!r} sketch — "
                        "distinct_col was enabled after windows were "
                        "already absorbed. Backfill the sketch from the "
                        "full fact history (operators.sketches.hll_rollup "
                        "writes it) or rebuild the rollup from scratch")
                merged_sk = (hll_merge(prev_sk.unionByName(sk), self.keys)
                             if prev_sk is not None else sk)
                self.catalog.write_table(
                    merged_sk, self.table + SKETCH_SUFFIX, batch_id)
                # estimate from the COMMITTED sketch files, not the live
                # plan — one execution of the union, consistent with what
                # the next refresh will read
                est = hll_estimate(self.catalog.read_table(
                    self.spark, self.table + SKETCH_SUFFIX,
                    batch_id=batch_id))
                # null-safe like the additive merge: the NULL group's
                # estimate must attach too
                cond = None
                for k in self.keys:
                    eq = rollup[k].eqNullSafe(est[k])
                    cond = eq if cond is None else (cond & eq)
                out = rollup.join(est, cond, "left").drop(
                    *[est[k] for k in self.keys])

            id_cols = [self.fact_id_col] + (
                [self.fact_ts_col] if self.fact_ts_col else [])
            ids = new_facts.select(*id_cols)
            # allowMissingColumns: adopting (or dropping) fact_ts_col on a
            # deployment whose id log predates the change must not brick
            # every subsequent refresh with NUM_COLUMNS_MISMATCH — legacy
            # rows get a NULL ts, which the horizon filter below KEEPS
            # (they simply never age out), and a dropped ts column stays
            # in the log as NULL for new rows
            all_ids = ids if seen is None else \
                seen.unionByName(ids, allowMissingColumns=True) \
                    .dropDuplicates([self.fact_id_col])
            if horizon is not None:
                # NULL/blank-safe: a fact with no usable event time can
                # never age past the horizon (there is nothing to
                # compare), so its id must STAY in the log — `null >=
                # horizon` is null and `'' >= horizon` is false, so a bare
                # filter would evict exactly the rows whose re-delivery
                # the log exists to absorb (double-count on the next
                # overlapping window)
                ts = F.col(self.fact_ts_col)
                all_ids = all_ids.filter(~nonblank(ts) | (ts >= horizon))
            self.catalog.write_table(all_ids, self.table + PROCESSED_SUFFIX,
                                     batch_id)
            self.catalog.write_table(out, self.table, batch_id)
        finally:
            new_facts.unpersist()
        return out

    @property
    def tables(self) -> list[str]:
        """All tables one refresh writes — pass to catalog.promote."""
        out = [self.table, self.table + PROCESSED_SUFFIX]
        if self.distinct_col is not None:
            out.append(self.table + SKETCH_SUFFIX)
        return out

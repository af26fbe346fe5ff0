"""Join-reduction rewrites — anti-join against a huge table without
shuffling the huge table.

Not in the reference (udata-hydra's dedup-on-arrival is a SQL
``NOT EXISTS`` the database planner rewrites for it;
``udata_hydra/db/resource.py`` insert paths); first-class here because
the incremental-ingest anti-join — "which of today's N new documents are
NOT already in the 100 TB corpus?" — is the one join shape Catalyst
cannot save by itself:

* ``batch LEFT ANTI corpus ON fp`` can only broadcast its RIGHT side,
  and the right side is the corpus. With both sides large-ish, the plan
  is a sort-merge join that SHUFFLES THE ENTIRE CORPUS to answer a
  question about a day's batch.

The fix is the classic semi-join reduction (Bernstein/Chiu, the
distributed-query-optimization result AQE's runtime bloom filters —
``session.enable_runtime_filters`` — approximate): the corpus never
needs to move, only the tiny slice of it that could possibly match.

1. ``candidates = corpus ⋉ broadcast(batch keys)`` — one corpus SCAN
   (no exchange; the broadcast hashed relation does the probing), output
   bounded by the batch's distinct keys, not by the corpus;
2. ``batch ▷ broadcast(candidates)`` — the real anti-join, now against
   a frame small by construction.

The rewrite is EXACT, not approximate: step 1 can only drop corpus rows
whose key is absent from the batch, and such rows can never eliminate a
batch row in the anti-join. (Same argument makes the left-semi variant
exact.) So the result is row-identical to the plain anti-join and the
operator keeps a full-strength oracle, unlike a bloom-gated
probabilistic prefilter.

Contract: the BATCH side's distinct keys must fit in a broadcast —
that is the premise of incremental ingest (bounded arrivals against an
unbounded corpus). The corpus side may be arbitrarily large; it is
scanned once and never exchanged (plan-pinned by
test_physical_plans.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from udata_datalake_service_spark.caching import adopt


def _keys(on: str | Sequence[str]) -> list[str]:
    ks = [on] if isinstance(on, str) else list(on)
    if not ks:
        raise ValueError("reduced join: `on` must name at least one column")
    return ks


def _reduced(
    batch: DataFrame,
    corpus: DataFrame,
    on: str | Sequence[str],
    how: str,
    persist_candidates: bool,
) -> DataFrame:
    ks = _keys(on)
    batch_keys = batch.select(*ks).dropDuplicates(ks)
    candidates = (
        corpus.select(*ks)
        .join(F.broadcast(batch_keys), on=ks, how="left_semi")
        .dropDuplicates(ks)
    )
    if persist_candidates:
        candidates = candidates.persist()
    out = batch.join(F.broadcast(candidates), on=ks, how=how)
    return adopt(out, candidates) if persist_candidates else out


def reduced_anti_join(
    batch: DataFrame,
    corpus: DataFrame,
    on: str | Sequence[str],
    persist_candidates: bool = True,
) -> DataFrame:
    """``batch LEFT ANTI corpus ON on`` without shuffling ``corpus``.

    Row-identical to the plain anti-join (see module docstring for the
    exactness argument). The candidate key set is persisted and adopted
    onto the result by default — it feeds the broadcast and would
    otherwise recompute the corpus scan if the consumer triggers two
    actions; pass ``persist_candidates=False`` for single-action plans
    (and plan inspection, where the cache would hide the corpus side).
    """
    return _reduced(batch, corpus, on, "left_anti", persist_candidates)


def reduced_semi_join(
    batch: DataFrame,
    corpus: DataFrame,
    on: str | Sequence[str],
    persist_candidates: bool = True,
) -> DataFrame:
    """``batch LEFT SEMI corpus ON on`` with the same reduction: the
    corpus contributes only the keys the batch could match."""
    return _reduced(batch, corpus, on, "left_semi", persist_candidates)

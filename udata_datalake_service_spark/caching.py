"""Persist-lifecycle helpers: adopt / settle.

Spark's ``CacheManager`` holds a strong reference to every persisted
DataFrame, so a ``df.persist()`` without a matching ``unpersist()`` leaks
executor storage for the whole session — a real problem for long-lived
services (the reference runs as a daemon; see
``/root/reference/udata_hydra/crawl.py`` for its always-on loop).

Operators in this package must stay LAZY: composition, AQE re-planning
and fault-tolerant lineage at cluster scale all depend on returning
undeclared plans, so an operator can never know when "its" action runs
and therefore can never release its own intermediate caches. The
contract that squares this:

* an operator that persists an intermediate (inverted index, signature
  table, doc-term grain…) attaches it to its result with
  ``adopt(result, cache, …)`` — zero behavior change, pure bookkeeping;
* whoever owns the ACTION (a query wrapper, a CLI verb, a sink write)
  finishes with ``settle(result, *extra)`` — materialize the result once
  (``localCheckpoint(eager=True)``: the result is job-output-sized and
  about to be consumed anyway) and release every adopted cache.

``settle`` is an action boundary: never call it inside a lazy
composition, only where the result is about to be collected/written.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_adopted_caches"


def adopt(result: DataFrame, *caches: DataFrame) -> DataFrame:
    """Attach persisted intermediates to ``result`` for later release.

    Propagates caches already adopted by ``caches``' own lineage is the
    caller's job: pass ``*adopted(upstream)`` explicitly when composing.
    """
    result.__dict__.setdefault(_ATTR, []).extend(caches)
    return result


def adopted(*dfs: DataFrame) -> list[DataFrame]:
    """The caches adopted by each of ``dfs`` (for re-adoption after a
    derived DataFrame — union, join, select — drops the attribute)."""
    return [c for d in dfs for c in getattr(d, _ATTR, [])]


def settle(result: DataFrame, *extra: DataFrame) -> DataFrame:
    """Materialize ``result`` eagerly and unpersist every adopted (and
    ``extra``) intermediate cache.

    ``localCheckpoint`` rather than collect: the materialized blocks live
    on the executors (result-sized, freed when the returned frame is
    garbage-collected by the ContextCleaner), and downstream consumers —
    the driver's collect, a sink write — read them without recomputing
    the released subtree."""
    out = result.localCheckpoint(eager=True)
    seen: dict[int, DataFrame] = {}
    for c in [*adopted(result), *extra]:
        seen.setdefault(id(c), c)
    for c in seen.values():
        c.unpersist()
    result.__dict__.pop(_ATTR, None)
    return out

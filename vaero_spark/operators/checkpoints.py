"""Managed release of per-round ``localCheckpoint`` blocks.

The iterative operators (min-label connected components, Lloyd's
k-means, TextRank) MUST ``localCheckpoint()`` every round — an all-lazy
loop re-analyzes the 2^k lineage tree (the CLAUDE.md invariant; persist
does not help because analysis walks the logical plan before cache
substitution). But a local checkpoint pins its RDD blocks for the
session lifetime, and Spark offers no DataFrame-level handle to release
them: after one ``emb_kmeans`` run r6 measured 12 pinned RDDs that were
never freed — benign at gate scale, corpus-sized and session-lived at
100 TB (guide §5: unpersist when done).

:class:`CheckpointTracker` closes the leak by diffing the context's
persistent-RDD map around each round's materialization. Only RDDs whose
``isLocallyCheckpointed()`` flag is set are ever touched — managed
DataFrame caches (``dedup._ACTIVE_CACHES``) share the persistent map
and must stay under their own ownership. Lifecycle:

- round ``k``'s blocks are released the moment round ``k+1`` has
  materialized (eager localCheckpoint — by then they are provably dead:
  the only reader was round ``k+1``'s build job, which has completed);
- static per-invocation checkpoints (TextRank's edge relation) are
  pinned via :meth:`pin_static` and released at :meth:`finish` — the
  returned DataFrame reads only the final round's blocks;
- the FINAL round's blocks back the returned DataFrame (lineage is
  truncated — unpersisting them before consumption would be an error,
  not a recompute), so they are handed to a module registry that the
  NEXT iterative-op invocation releases — the same single-lingering-set
  ownership contract as ``dedup._ACTIVE_CACHES``, with the stricter
  caveat that a registry entry must only be released once its result
  has been consumed (every gate/test consumes results before invoking
  the next iterative op).
"""

from __future__ import annotations

#: final-round block handles (py4j JavaRDD) of the LAST iterative-op
#: invocation — released when the next invocation starts
_LIVE: list = []


def _checkpoint_rdds(sc) -> dict:
    """id -> JavaRDD handle of every persisted LOCALLY-CHECKPOINTED RDD
    (DataFrame caches in the same map are deliberately excluded)."""
    jmap = sc._jsc.getPersistentRDDs()  # noqa: SLF001 — no public API
    out = {}
    for k in jmap.keySet().toArray():
        h = jmap[k]
        try:
            if h.rdd().isLocallyCheckpointed():
                out[int(k)] = h
        except Exception:  # defensive: never let bookkeeping kill the op
            pass
    return out


def _unpersist_all(handles: list) -> None:
    while handles:
        try:
            handles.pop().unpersist(False)
        except Exception:  # session gone / already released — both fine
            pass


def release_final_rounds() -> None:
    """Release the previous iterative op's final-round checkpoint blocks."""
    _unpersist_all(_LIVE)


class CheckpointTracker:
    """Track ONE iterative-op invocation's per-round checkpoint blocks.

    Usage::

        trk = CheckpointTracker(df.sparkSession)
        static = (...).localCheckpoint()    # optional invocation-static
        trk.pin_static()                    # held until finish()
        for ...:
            cur = (...).localCheckpoint()   # eager
            trk.round_done()                # frees the PREVIOUS round
        trk.finish()                        # final round -> module registry
    """

    def __init__(self, spark):
        self.sc = spark.sparkContext
        release_final_rounds()
        self._known = set(_checkpoint_rdds(self.sc))
        self._prev: list = []
        self._static: list = []

    def _fresh(self) -> list:
        cur = _checkpoint_rdds(self.sc)
        fresh = [h for rid, h in cur.items() if rid not in self._known]
        self._known.update(cur)
        return fresh

    def pin_static(self) -> None:
        """Blocks checkpointed since the last call live until finish()."""
        self._static.extend(self._fresh())

    def round_done(self) -> None:
        fresh = self._fresh()
        _unpersist_all(self._prev)
        self._prev = fresh

    def finish(self) -> None:
        """Static blocks are dead (the result reads only the final
        round); the final round's blocks go to the module registry."""
        _unpersist_all(self._static)
        _LIVE.extend(self._prev)
        self._prev = []

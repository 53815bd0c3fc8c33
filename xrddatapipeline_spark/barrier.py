"""Lineage-barrier helpers shared by the image plan and iterative operators.

Iterative Spark algorithms (hash-min / large-star connected components,
k-means) and deep per-image plans both hit the same driver-side wall:
every round/stage stacks another layer of logical plan, and Catalyst
re-analyzes the whole tree per action — `persist` caches DATA but does
not truncate LINEAGE. `DataFrame.localCheckpoint(eager=True)` cuts the
plan down to a LogicalRDD scan; these helpers wrap it with the matching
storage-release call (Dataset.unpersist does NOT free a localCheckpoint's
RDD — only the GC-driven ContextCleaner would, far too late for a
long-lived stream or a many-round loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release(df: DataFrame) -> None:
    """Free a barrier frame: drop the checkpointed RDD behind a LogicalRDD
    leaf (localCheckpoint) AND unpersist any Dataset-level cache on ``df``.

    Searches the analyzed plan's LEAVES, not just the root: callers often
    hold a projection over the checkpointed frame (e.g.
    ``ckpt.select(...)``) — a root-only check would silently fall through
    to Dataset.unpersist, which does NOT free localCheckpoint storage,
    reintroducing the leak this helper exists to prevent.

    Safety rules (round-4 ADVICE):

    - The leaf is freed only when it is UNAMBIGUOUS — exactly one
      LogicalRDD leaf in the plan. A frame spanning several checkpoints
      (e.g. a join of two checkpointed frames) does not own its leaves:
      a localCheckpoint RDD cannot recompute after unpersist (lineage is
      truncated), so freeing a sibling here would break every other
      consumer of that checkpoint. Release each checkpointed frame
      individually instead; a warning points there.
    - ``df.unpersist()`` runs regardless: a PERSISTED projection over a
      checkpoint previously early-returned after freeing the leaf and
      leaked its own cache entry. (It is a no-op on non-persisted frames,
      and on checkpoint frames — localCheckpoint storage is RDD-level,
      invisible to the Dataset cache manager.)
    """
    import warnings

    try:
        lp = df._jdf.queryExecution().analyzed()
        leaves = lp.collectLeaves()
        rdd_leaves = [
            leaves.apply(i)
            for i in range(leaves.size())
            if leaves.apply(i).getClass().getName().endswith("LogicalRDD")
        ]
        if len(rdd_leaves) == 1:
            rdd_leaves[0].rdd().unpersist(False)
        elif len(rdd_leaves) > 1:
            warnings.warn(
                f"release: frame spans {len(rdd_leaves)} checkpoint leaves "
                "(join of checkpointed frames?) — freeing none of them; "
                "release each checkpointed frame individually",
                RuntimeWarning,
                stacklevel=2,
            )
    except Exception as e:
        # JVM internals moved (PySpark upgrade): Dataset.unpersist below
        # does NOT free localCheckpoint RDDs, so a silent fallback would
        # reintroduce the slow storage leak in long-lived streams — warn.
        warnings.warn(
            f"release: LogicalRDD unpersist path failed ({e!r}); "
            "falling back to Dataset.unpersist, which leaks "
            "localCheckpoint storage until GC",
            RuntimeWarning,
            stacklevel=2,
        )
    df.unpersist()

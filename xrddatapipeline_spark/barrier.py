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
    """Free a barrier frame: unpersist a cached plan, or drop the
    checkpointed RDD(s) behind any LogicalRDD leaf (localCheckpoint).

    Searches the analyzed plan's LEAVES, not just the root: callers often
    hold a projection over the checkpointed frame (e.g.
    ``ckpt.select(...)``) — a root-only check would silently fall through
    to Dataset.unpersist, which does NOT free localCheckpoint storage,
    reintroducing the leak this helper exists to prevent.
    """
    try:
        lp = df._jdf.queryExecution().analyzed()
        leaves = lp.collectLeaves()
        freed = False
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getName().endswith("LogicalRDD"):
                leaf.rdd().unpersist(False)
                freed = True
        if freed:
            return
    except Exception as e:
        # JVM internals moved (PySpark upgrade): Dataset.unpersist below
        # does NOT free localCheckpoint RDDs, so a silent fallback would
        # reintroduce the slow storage leak in long-lived streams — warn.
        import warnings

        warnings.warn(
            f"release: LogicalRDD unpersist path failed ({e!r}); "
            "falling back to Dataset.unpersist, which leaks "
            "localCheckpoint storage until GC",
            RuntimeWarning,
            stacklevel=2,
        )
    df.unpersist()

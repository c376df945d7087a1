"""Driver-thread job overlap (guide §2.6): Spark schedules concurrent jobs
FIFO, so materializing INDEPENDENT frames from a small set of driver
threads lets the later job's tasks back-fill executors freed by the earlier
job's task tail instead of serializing behind it.

Only use for frames with no data dependency on each other whose shared
upstream frames are already materialized (a persisted-but-unmaterialized
common parent would be computed once per thread, racing the cache).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def collect_all(*dfs: DataFrame) -> tuple[list, ...]:
    """``collect()`` each frame on its own driver thread; returns the row
    lists in argument order. For small result frames (single-row stats
    aggregates) this is ONE job per frame, where checkpoint-then-collect
    would pay two. Exceptions propagate after every thread has finished."""
    from pyspark import InheritableThread

    out: list = [None] * len(dfs)

    def _run(i: int, df: DataFrame) -> None:
        try:
            out[i] = df.collect()
        except BaseException as exc:  # re-raised on the caller's thread
            out[i] = exc

    threads = [
        InheritableThread(target=_run, args=(i, df)) for i, df in enumerate(dfs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for v in out:
        if isinstance(v, BaseException):
            raise v
    return tuple(out)


def eager_checkpoints(*dfs: DataFrame) -> tuple[DataFrame, ...]:
    """``localCheckpoint(eager=True)`` each frame on its own driver thread;
    returns the checkpointed frames in argument order. Exceptions propagate
    to the caller after every thread has finished."""
    from pyspark import InheritableThread

    out: list[DataFrame | BaseException | None] = [None] * len(dfs)

    def _mat(i: int, df: DataFrame) -> None:
        try:
            out[i] = df.localCheckpoint(eager=True)
        except BaseException as exc:  # re-raised on the caller's thread
            out[i] = exc

    threads = [
        InheritableThread(target=_mat, args=(i, df)) for i, df in enumerate(dfs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for v in out:
        if isinstance(v, BaseException):
            raise v
    return tuple(out)  # type: ignore[arg-type]

"""Per-stage / per-partition execution metrics.

The north rule asks the build to emit per-stage metrics — docs/sec,
postings/sec, **shuffle bytes** — per partition. Throughput numbers
come from the build's own lineage records (``index/build.py``); this
module supplies the execution-side counters by reading Spark's
``AppStatusStore`` — the driver-side store that backs the UI and REST
API. It is populated from executor heartbeats even with
``spark.ui.enabled=false``, needs no listener registration, and works
identically on local mode and a real cluster, so the same call sites
emit real shuffle/input/spill numbers at 1000 executors.

Access goes through py4j internals (``sc._jsc.sc().statusStore()``),
which is a private surface — every reader here degrades to an empty
result instead of failing the job if a future Spark reshapes it.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession


def _status_store(spark: SparkSession):
    return spark.sparkContext._jsc.sc().statusStore()


def _stage_seq(spark: SparkSession):
    gw = spark.sparkContext._gateway
    empty = gw.jvm.java.util.ArrayList()
    darr = gw.new_array(gw.jvm.double, 0)
    return _status_store(spark).stageList(empty, False, False, darr, empty)


def _max_stage_id(spark: SparkSession) -> int:
    """High-water stage id — one py4j getter per retained stage, the
    cheap form ``MetricsWindow.__enter__`` needs (materializing full
    stage rows costs ~13 getters each across up to 1000 stages)."""
    try:
        stages = _stage_seq(spark)
        return max(
            (stages.apply(i).stageId() for i in range(stages.size())),
            default=-1,
        )
    except Exception:
        return -1


def stage_metrics(
    spark: SparkSession, min_stage_id: int = -1
) -> list[dict[str, Any]]:
    """Snapshot of every stage Spark has run in this session (or only
    those with id above ``min_stage_id``): one dict per stage with
    task counts, input/output bytes, and shuffle read/write bytes.
    Newest first (store order)."""
    try:
        stages = _stage_seq(spark)
        out = []
        for i in range(stages.size()):
            st = stages.apply(i)
            if st.stageId() <= min_stage_id:
                continue
            out.append(
                {
                    "stage_id": st.stageId(),
                    "attempt": st.attemptId(),
                    "status": str(st.status()),
                    "name": str(st.name()),
                    "num_tasks": st.numTasks(),
                    "num_complete_tasks": st.numCompleteTasks(),
                    "input_bytes": st.inputBytes(),
                    "output_bytes": st.outputBytes(),
                    "shuffle_write_bytes": st.shuffleWriteBytes(),
                    "shuffle_read_bytes": st.shuffleReadBytes(),
                    "executor_run_time_ms": st.executorRunTime(),
                    "memory_spill_bytes": st.memoryBytesSpilled(),
                    "disk_spill_bytes": st.diskBytesSpilled(),
                }
            )
        return out
    except Exception:  # private surface — degrade, never fail the job
        return []


def task_metrics(
    spark: SparkSession, stage_id: int, max_tasks: int = 10_000
) -> list[dict[str, Any]]:
    """Per-task (= per-partition) metrics for one stage: the
    finest-grained evidence of skew — a partition whose shuffle write
    or runtime dwarfs its siblings is the salting candidate."""
    try:
        tl = _status_store(spark).taskList(stage_id, 0, max_tasks)
        out = []
        for i in range(tl.size()):
            t = tl.apply(i)
            tm_opt = t.taskMetrics()
            if not tm_opt.isDefined():
                continue
            tm = tm_opt.get()
            out.append(
                {
                    "partition": t.index(),
                    "executor_run_time_ms": tm.executorRunTime(),
                    "input_records": tm.inputMetrics().recordsRead(),
                    "input_bytes": tm.inputMetrics().bytesRead(),
                    "shuffle_write_bytes": (
                        tm.shuffleWriteMetrics().bytesWritten()
                    ),
                    "shuffle_read_bytes": (
                        tm.shuffleReadMetrics().localBytesRead()
                        + tm.shuffleReadMetrics().remoteBytesRead()
                    ),
                    "memory_spill_bytes": tm.memoryBytesSpilled(),
                }
            )
        return sorted(out, key=lambda r: r["partition"])
    except Exception:
        return []


class MetricsWindow:
    """Capture the stages a block of work ran::

        with MetricsWindow(spark) as mw:
            build_index(...)
        totals = mw.totals()      # summed shuffle/input bytes
        stages = mw.stages()      # per-stage rows
        tasks  = mw.task_detail() # per-partition rows, heaviest stage

    Stage ids are monotonically increasing per SparkContext, so the
    window is simply "stages with id above the entry-time high-water
    mark" — no listener, no race with concurrent history eviction.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._mark = -1
        self._stages: list[dict[str, Any]] = []

    def __enter__(self) -> "MetricsWindow":
        self._mark = _max_stage_id(self.spark)
        return self

    def __exit__(self, *exc) -> None:
        # the status store is fed from the async listener bus, so the
        # job's final StageCompleted/TaskEnd events may land AFTER the
        # action returns — poll (bounded) until the window's stages
        # stop changing and none is still ACTIVE/PENDING, else accept
        # the best snapshot rather than hang
        import time

        prev = None
        deadline = time.time() + 2.0
        while True:
            cur = stage_metrics(self.spark, min_stage_id=self._mark)
            settled = all(
                s["status"] not in ("ACTIVE", "PENDING") for s in cur
            )
            key = [
                (s["stage_id"], s["status"], s["num_complete_tasks"])
                for s in cur
            ]
            if (settled and key == prev) or time.time() > deadline:
                self._stages = cur
                return
            prev = key
            # settled snapshots re-read immediately (accept on the
            # second equal read — a couple of py4j ms, no sleep inside
            # the caller's timed window); only an actively-changing
            # store waits
            if not settled:
                time.sleep(0.05)

    def stages(self) -> list[dict[str, Any]]:
        return sorted(self._stages, key=lambda s: s["stage_id"])

    def totals(self) -> dict[str, int]:
        keys = (
            "num_complete_tasks",
            "input_bytes",
            "output_bytes",
            "shuffle_write_bytes",
            "shuffle_read_bytes",
            "executor_run_time_ms",
            "memory_spill_bytes",
            "disk_spill_bytes",
        )
        return {
            k: sum(int(s[k]) for s in self._stages) for k in keys
        }

    def task_detail(self) -> list[dict[str, Any]]:
        """Per-partition metrics for the window's heaviest stage (by
        executor run time) — the stage where skew would live."""
        if not self._stages:
            return []
        heaviest = max(
            self._stages, key=lambda s: s["executor_run_time_ms"]
        )
        return task_metrics(self.spark, heaviest["stage_id"])


def sum_lineage_exec(
    index_dir: str,
    keys: tuple[str, ...] = (
        "shuffle_write_bytes",
        "shuffle_read_bytes",
        "memory_spill_bytes",
        "disk_spill_bytes",
    ),
) -> dict[str, int]:
    """Aggregate the ``exec`` counters across an index's committed
    group lineage records — the single definition site bench.py and
    scaling_bench share."""
    import glob
    import json
    import os

    totals = {k: 0 for k in keys}
    for p in glob.glob(os.path.join(index_dir, "_lineage", "group-*.json")):
        with open(p) as f:
            rec = json.load(f)
        for k in keys:
            totals[k] += int(rec.get("exec", {}).get(k, 0))
    return totals


def skew_summary(partitions: list[dict[str, Any]]) -> dict[str, Any]:
    """Max/median ratios over per-partition task rows — the one-number
    skew evidence: a ratio near 1 means the bucket/salting strategy
    spread the work evenly; a hot partition shows up as a large ratio
    long before it becomes a straggler at 1000 executors."""
    def ratio(key: str) -> float:
        vals = sorted(int(p[key]) for p in partitions)
        if not vals or vals[-1] == 0:
            return 1.0
        # LOWER middle: the upper-middle element IS the max at n=2,
        # which would report ratio 1.0 for a fully skewed 2-partition
        # stage — the exact case the metric exists to expose
        med = vals[(len(vals) - 1) // 2]
        return round(vals[-1] / max(med, 1), 3)

    if not partitions:
        return {}
    return {
        "n_partitions": len(partitions),
        "runtime_max_over_median": ratio("executor_run_time_ms"),
        "shuffle_read_max_over_median": ratio("shuffle_read_bytes"),
        "input_max_over_median": ratio("input_records"),
    }

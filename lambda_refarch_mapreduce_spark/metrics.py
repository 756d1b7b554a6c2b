"""Job stats + cost model (reference operators O12-O14).

The reference threads stats through S3 object user-metadata
(mapper.py:65-72: linecount/processingtime/memoryUsage), aggregates
per-task triples in the driver (driver.py:216-255) and prices the job
with hard-coded AWS rates (driver.py:259-268: Lambda $0.00001667/GB·s,
S3 GET $0.004/10k, PUT $0.005/1k).

Spark already measures everything the reference hand-counts; this
module is the ~100 LoC of glue SURVEY.md §7.3 predicted: pull task
metrics from the SparkContext status API and map them through a
configurable $/unit cost model with the same report shape the
reference driver prints (total compute-seconds, I/O ops, dollars).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class CostModel:
    """Rates in the shape of driver.py:259-268, re-based to core-hours.

    The reference prices GB-seconds of Lambda + S3 ops; the Spark
    analog is core-hours + bytes moved. Defaults approximate on-demand
    cloud pricing; they are inputs, not truths.
    """

    usd_per_core_hour: float = 0.04
    usd_per_tb_scanned: float = 5.0  # S3 GET-equivalent
    usd_per_tb_shuffled: float = 1.0
    usd_per_tb_written: float = 5.0  # S3 PUT-equivalent


@dataclass
class JobStats:
    wall_secs: float = 0.0
    executor_run_secs: float = 0.0
    bytes_read: int = 0
    bytes_written: int = 0
    shuffle_bytes: int = 0
    rows_read: int = 0
    cost_usd: float = 0.0
    # True only when the byte counters were actually measured (stage
    # metrics via the UI REST API). When False the report omits them
    # and the cost model prices core-hours only — never emit a zero
    # that reads as "measured zero bytes".
    bytes_measured: bool = False
    extra: dict = field(default_factory=dict)

    def report(self) -> dict:
        out = {
            "wall_secs": round(self.wall_secs, 3),
            "executor_run_secs": round(self.executor_run_secs, 3),
            "rows_read": self.rows_read,
            "cost_usd": round(self.cost_usd, 6),
        }
        if self.bytes_measured:
            out["bytes_read"] = self.bytes_read
            out["bytes_written"] = self.bytes_written
            out["shuffle_bytes"] = self.shuffle_bytes
        out.update(self.extra)
        return out


class MeasuredRun:
    """Context manager: run an action, collect stage metrics + cost.

    Usage::

        with MeasuredRun(spark) as m:
            df.write.parquet(out)
        print(m.stats.report())
    """

    def __init__(self, spark: SparkSession, cost_model: CostModel | None = None):
        self.spark = spark
        self.cost = cost_model or CostModel()
        self.stats = JobStats()
        self._t0 = 0.0
        self._jobs_before: set[int] = set()
        self._stages_before: set[int] = set()

    def _job_ids(self) -> set[int]:
        tracker = self.spark.sparkContext.statusTracker()
        return set(tracker.getJobIdsForGroup(None) or [])

    def _rest_stages(self) -> list[dict] | None:
        """Completed-stage metrics from the UI REST API, or None when
        the UI is disabled/unreachable (local test sessions disable it;
        cluster deployments have it on by default)."""
        sc = self.spark.sparkContext
        ui = sc.uiWebUrl
        if not ui:
            return None
        try:
            import json as _json
            import urllib.request

            url = f"{ui}/api/v1/applications/{sc.applicationId}/stages?status=complete"
            with urllib.request.urlopen(url, timeout=2) as resp:
                return _json.load(resp)
        except Exception:
            return None

    @staticmethod
    def _stage_ids(stages: list[dict] | None) -> set[int]:
        return {s["stageId"] for s in stages or []}

    def __enter__(self) -> "MeasuredRun":
        self._t0 = time.monotonic()
        self._jobs_before = self._job_ids()
        self._stages_before = self._stage_ids(self._rest_stages())
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.stats.wall_secs = time.monotonic() - self._t0
        if exc_type is not None:
            return
        sc = self.spark.sparkContext
        self.stats.extra["n_jobs"] = len(self._job_ids() - self._jobs_before)
        stages = self._rest_stages()
        if stages is not None:
            new = [s for s in stages if s["stageId"] not in self._stages_before]
            self.stats.bytes_read = sum(s.get("inputBytes", 0) for s in new)
            self.stats.bytes_written = sum(s.get("outputBytes", 0) for s in new)
            self.stats.shuffle_bytes = sum(
                s.get("shuffleWriteBytes", 0) for s in new
            )
            self.stats.executor_run_secs = (
                sum(s.get("executorRunTime", 0) for s in new) / 1000.0
            )
            self.stats.rows_read = sum(s.get("inputRecords", 0) for s in new)
            self.stats.extra["n_stages"] = len(new)
            self.stats.bytes_measured = True
        # Cost: wall * reserved-cores (what a cluster actually bills,
        # matching the reference's billed-GB-seconds accounting), plus
        # byte terms only when the byte counters were really measured.
        core_hours = self.stats.wall_secs * sc.defaultParallelism / 3600.0
        self.stats.cost_usd = core_hours * self.cost.usd_per_core_hour
        if self.stats.bytes_measured:
            self.stats.cost_usd += (
                self.stats.bytes_read / 1e12 * self.cost.usd_per_tb_scanned
                + self.stats.shuffle_bytes / 1e12 * self.cost.usd_per_tb_shuffled
                + self.stats.bytes_written / 1e12 * self.cost.usd_per_tb_written
            )


def observe(df: DataFrame, name: str = "metrics", **aggs) -> tuple[DataFrame, "Observation"]:
    """Attach named aggregate metrics computed inline with the next
    action (the Spark analog of the reference's S3-metadata stats
    side channel, mapper.py:65-72 — but exact and free: executors
    accumulate during the scan, no second pass).

    Returns (observed_df, observation); read ``observation.get`` after
    an action ran. ``aggs`` maps metric name -> aggregate Column;
    defaults to a row count.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    if not aggs:
        aggs = {"rows": F.count(F.lit(1))}
    obs = Observation(name)
    return df.observe(obs, *[c.alias(k) for k, c in aggs.items()]), obs

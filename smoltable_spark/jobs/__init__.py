from smoltable_spark.jobs.metrics import MetricsTable
from smoltable_spark.jobs.workers import gc_worker, row_count_worker, system_metrics_worker

__all__ = ["MetricsTable", "gc_worker", "row_count_worker", "system_metrics_worker"]

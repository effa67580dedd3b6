"""Sink connectors — SURVEY §2.1 S11/S12 semantics behind one seam.

The reference's write discipline is idempotent batch commits:
  S11 upsert       INSERT … ON CONFLICT DO UPDATE
                   (/root/reference/ec2/rds/upsert.py:4-52)
  S12 replace-doc  DELETE WHERE key IN (...) + insert per batch
                   (/root/reference/ec2/parse_arxiv_papers/__main__.py:269-283)

On a lakehouse these are `MERGE INTO`; this container has no Iceberg
runtime, so the DEFAULT implementation (`ParquetBucketSink`) delivers
the same semantics as deterministic partition-hash overwrite on plain
parquet: rows are bucketed by key hash into `kb=<n>` partitions and an
upsert rewrites ONLY the buckets containing affected keys — bounded
I/O, atomic per partition, which is exactly the property MERGE gives.

`UpsertSink` is the seam: `IcebergMergeSink` implements the same
contract — upsert as a single `MERGE INTO`, replace as literal
DELETE-then-INSERT (MERGE cannot express multi-row-per-key
replacement) — gated on the Iceberg extension being on the session's
classpath (`iceberg_available`); a lakehouse deployment swaps
implementations without touching any call site.
Module-level `upsert_parquet` / `replace_documents` keep their original
signatures as wrappers over the default sink.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession, functions as F

N_KEY_BUCKETS = 64


class UpsertSink(ABC):
    """S11/S12 write contract: last-writer-wins upsert by key, and
    replace-document (delete every existing row for the incoming keys,
    then insert the new rows — identical to upsert when the new batch
    carries exactly one row per key, which both implementations here
    require of their input)."""

    @abstractmethod
    def upsert(
        self, spark: SparkSession, table: str, new_rows: DataFrame, key: str
    ) -> None:
        """S11: merge `new_rows` into `table` by `key`, new rows win.
        Input batches must carry one row per key (MERGE semantics)."""

    def replace(
        self, spark: SparkSession, table: str, new_rows: DataFrame, key: str
    ) -> None:
        """S12 delete-then-insert: EVERY existing row for the incoming
        keys is dropped, then all batch rows land — multi-row-per-key
        tables supported (a document's unit rows are fully superseded
        by a re-parse). Default delegates to upsert, which is identical
        when both table and batch hold one row per key; implementations
        whose upsert can't express the multi-row case override this."""
        self.upsert(spark, table, new_rows, key)


class ParquetBucketSink(UpsertSink):
    """Default: key-hash bucket overwrite on plain parquet (no table
    format runtime needed). Rewrites only the `kb=` partitions that
    contain incoming keys — bounded I/O per batch, atomic per
    partition."""

    def __init__(self, n_buckets: int = N_KEY_BUCKETS):
        self.n_buckets = int(n_buckets)

    def _with_bucket(self, df: DataFrame, key: str) -> DataFrame:
        return df.withColumn(
            "kb", F.pmod(F.xxhash64(F.col(key)), F.lit(self.n_buckets)).cast("int")
        )

    def upsert(
        self, spark: SparkSession, table: str, new_rows: DataFrame, key: str
    ) -> None:
        from pyspark.errors import AnalysisException

        new_b = self._with_bucket(new_rows, key)
        buckets = [r["kb"] for r in new_b.select("kb").distinct().collect()]
        try:
            existing = spark.read.parquet(table).filter(F.col("kb").isin(buckets))
            merged = existing.join(
                new_b.select(key).distinct(), key, "left_anti"
            ).unionByName(new_b)
        except AnalysisException as e:
            # ONLY "table doesn't exist yet" falls back to a fresh
            # write — missing path, or an existing-but-EMPTY dir
            # (UNABLE_TO_INFER_SCHEMA: no footers → no data to lose).
            # Any other read failure (corrupt footer, transient FS
            # error) must propagate: combined with dynamic partition
            # overwrite, treating it as first-write would silently drop
            # every other key in the affected kb= buckets.
            msg = str(e)
            if not any(
                s in msg
                for s in (
                    "PATH_NOT_FOUND",
                    "Path does not exist",
                    "UNABLE_TO_INFER_SCHEMA",
                )
            ):
                raise
            merged = new_b  # first write — table doesn't exist yet
        # dynamic overwrite of just the affected bucket partitions
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        merged.write.mode("overwrite").partitionBy("kb").parquet(table)


class IcebergMergeSink(UpsertSink):
    """Lakehouse implementation. `table` is a catalog table name (e.g.
    `cat.db.docs`), not a path. Requires the Iceberg Spark runtime on
    the session classpath; constructing the sink is allowed without it
    (so it can be configured up front), but any write without the
    runtime raises with a clear message.

    S11 upsert = one atomic `MERGE INTO` — the direct analog of the
    reference's ON CONFLICT DO UPDATE
    (/root/reference/ec2/rds/upsert.py:40-52). MERGE requires ONE
    source row per key (multiple matches are a runtime error), so it
    cannot express replace-document for multi-row keys — S12 replace
    is therefore implemented literally as the reference's
    DELETE WHERE key IN (batch) + INSERT
    (/root/reference/ec2/parse_arxiv_papers/__main__.py:269-283),
    matching ParquetBucketSink's drop-all-rows-for-incoming-keys
    semantics exactly."""

    @staticmethod
    def _require_runtime(spark: SparkSession) -> None:
        if not iceberg_available(spark):
            raise RuntimeError(
                "IcebergMergeSink requires the Iceberg Spark runtime "
                "(iceberg-spark-runtime jar + IcebergSparkSessionExtensions); "
                "not present in this session — use ParquetBucketSink"
            )

    @staticmethod
    def _with_source_view(new_rows: DataFrame):
        """Unique-per-call temp view (uuid, not hash — process-salted
        hash() collides under concurrent upserts) dropped in finally."""
        import contextlib
        import uuid

        @contextlib.contextmanager
        def cm():
            view = f"_upsert_src_{uuid.uuid4().hex}"
            new_rows.createOrReplaceTempView(view)
            try:
                yield view
            finally:
                new_rows.sparkSession.catalog.dropTempView(view)

        return cm()

    def upsert(
        self, spark: SparkSession, table: str, new_rows: DataFrame, key: str
    ) -> None:
        self._require_runtime(spark)
        q = "`{}`".format  # backtick-quote identifiers
        cols = new_rows.columns
        sets = ", ".join(f"t.{q(c)} = s.{q(c)}" for c in cols if c != key)
        vals = ", ".join(f"s.{q(c)}" for c in cols)
        # a key-only batch has nothing to UPDATE — an empty SET clause
        # is a MERGE syntax error at runtime, so emit the
        # insert-if-absent form instead (same semantics: matched rows
        # are already identical to the source)
        matched = f"WHEN MATCHED THEN UPDATE SET {sets} " if sets else ""
        with self._with_source_view(new_rows) as view:
            spark.sql(
                f"MERGE INTO {table} t USING {view} s ON t.{q(key)} = s.{q(key)} "
                + matched
                + f"WHEN NOT MATCHED THEN INSERT ({', '.join(q(c) for c in cols)}) "
                f"VALUES ({vals})"
            )

    def replace(
        self, spark: SparkSession, table: str, new_rows: DataFrame, key: str
    ) -> None:
        """NOT atomic: DELETE and INSERT are two Iceberg commits, so a
        crash between them loses the batch's old rows without the new
        ones landing, and a concurrent reader can observe the
        deleted-but-not-reinserted state — weaker than
        ParquetBucketSink (atomic per partition) and the reference's
        transactional DELETE+insert. Recover by re-running the batch
        (the DELETE is idempotent). A WAP/branch-staged variant would
        close the window; single-row-per-key batches can use `upsert`
        (one atomic MERGE) instead."""
        self._require_runtime(spark)
        q = "`{}`".format
        # INSERT with explicit column names: Spark SQL INSERT...SELECT
        # is positional, and a source whose column order differs from
        # the table's would land values in the wrong (same-typed)
        # columns without an error
        cols = ", ".join(q(c) for c in new_rows.columns)
        with self._with_source_view(new_rows) as view:
            spark.sql(
                f"DELETE FROM {table} WHERE {q(key)} IN (SELECT {q(key)} FROM {view})"
            )
            spark.sql(f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {view}")


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg session extension is actually loadable —
    configuration alone isn't enough (a configured-but-missing jar
    would fail at MERGE parse time with a worse error)."""
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    if "IcebergSparkSessionExtensions" not in ext:
        return False
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        )
        return True
    except Exception:
        return False


def get_sink(spark: SparkSession | None = None) -> UpsertSink:
    """The session's best available sink: Iceberg MERGE when the
    runtime is present, parquet bucket overwrite otherwise."""
    if spark is not None and iceberg_available(spark):
        return IcebergMergeSink()
    return ParquetBucketSink()


# ---------------------------------------------------------------------------
# Original module-level surface (unchanged behavior, default sink)
# ---------------------------------------------------------------------------

_DEFAULT_SINK = ParquetBucketSink()


def upsert_parquet(spark: SparkSession, table_dir: str, new_rows: DataFrame, key: str) -> None:
    """Upsert by key: last-writer-wins per key (S11). Rewrites only the
    key-hash buckets that contain new keys."""
    _DEFAULT_SINK.upsert(spark, table_dir, new_rows, key)


def replace_documents(
    spark: SparkSession, table_dir: str, new_docs: DataFrame, key: str
) -> None:
    """S12 delete-then-insert: all existing rows for the incoming keys
    are dropped, then the new rows land — replace-document semantics
    (a document's unit rows are fully superseded by a re-parse)."""
    _DEFAULT_SINK.replace(spark, table_dir, new_docs, key)


def append_jsonl(df: DataFrame, path: str) -> None:
    """S13: JSONL batch output (df.write.json)."""
    df.write.mode("append").json(path)

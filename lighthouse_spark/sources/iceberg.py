"""Iceberg table adapter — the north_rule's deployment source shape
("Iceberg table of source-code repositories with columns (repo, path,
commit, lang, content)" at 10^12 files).

The engine itself is storage-agnostic: every build/query path takes a
DataFrame, so Iceberg support is exactly this thin adapter plus the
runtime jar (`iceberg-spark-runtime`) on the cluster. This container
ships no Iceberg jar, so the adapter PROBES at call time and raises a
named error describing the missing dependency instead of faking reads
— the same honest-gap convention as the JPEG/PNG decoders.

What Iceberg buys at 10^12 files (and what the plain-parquet store
already mirrors structurally):
- snapshot isolation + atomic commits  → our versioned dirs + manifest-
  last `_commit` (store.py) are the same contract on plain parquet;
- hidden partitioning / partition pruning → our bucketed docs dirs and
  term-range-partitioned dictionary pass the same predicates;
- MERGE INTO file-level rewrite → sync.apply_incremental's
  touched-bucket rewrite is the identical cost model.
Swapping the store's parquet reads/writes for an Iceberg catalog is a
deployment change, not an engine change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# the north_rule input shape (input_hint)
CODE_TABLE_COLUMNS = ("repo", "path", "commit", "lang", "content")


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg runtime classes are loadable in the JVM.

    py4j resolves a missing class to a ``JavaPackage`` placeholder
    WITHOUT raising (attribute access on ``_jvm`` never probes the
    classloader), so the probe must be an explicit class load. Two
    loaders are tried because they see different jars: Spark's own
    ``Utils.classForName`` resolves against the (mutable) Spark
    classloader — the one ``spark.jars.packages``-delivered jars land
    in, where py4j's root-loader ``Class.forName`` would
    false-negative — and plain ``Class.forName`` covers classpath
    jars if the Utils signature ever shifts."""
    try:
        spark._jvm.org.apache.spark.util.Utils.classForName(
            "org.apache.iceberg.Table", False, False
        )
        return True
    except Exception:
        pass
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


def _check_iceberg(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise NotImplementedError(
            "Iceberg runtime not on the classpath — submit with "
            "--packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12 "
            "and a configured catalog (spark.sql.catalog.<name>=...)"
        )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read an Iceberg catalog table (e.g. ``catalog.db.repo_files``).

    Filters and column projections on the returned frame push into
    Iceberg's scan planning (partition + file pruning via manifests) —
    the same pushdown contract the plain-parquet tests pin."""
    _check_iceberg(spark)
    return spark.read.format("iceberg").load(table)


def read_code_table(spark: SparkSession, table: str) -> DataFrame:
    """The north_rule source-code table, projected to its contract
    columns (column pruning reaches the scan; nothing else is read)."""
    return read_table(spark, table).select(*CODE_TABLE_COLUMNS)


def write_table(
    df: DataFrame, table: str, mode: str = "append", partition_by: list[str] | None = None
) -> None:
    """Write a DataFrame as/into an Iceberg table (sorted writers and
    fanout are cluster-side table properties, not engine concerns)."""
    _check_iceberg(df.sparkSession)
    w = df.writeTo(table)
    if partition_by:
        from pyspark.sql import functions as F

        w = w.partitionedBy(*[F.col(c) for c in partition_by])
    if mode == "create":
        w.createOrReplace()
    else:
        w.append()

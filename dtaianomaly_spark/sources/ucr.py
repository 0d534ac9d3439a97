"""UCR anomaly-archive source (the reference's primary real-data loader).

Format (data/UCRLoader.py:7-37): one float per line; the file NAME
carries the metadata — ``..._<train_split>_<anomaly_start>_<anomaly_stop>
.txt`` — giving the train/test split point and the [start, stop) anomaly
label range.

Spark mapping: each file is read WHOLE (``wholetext``) so line order —
which IS the time axis — survives; lines explode to (pos, value) rows
with ``posexplode``, and the filename metadata becomes columns via
``input_file_name()`` + ``regexp_extract``. One row group per file keeps
per-series locality; a directory of millions of files turns into the
standard one-task-per-file scan, and everything downstream (rollup,
windows, detectors) consumes the same long form as the token corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NAME_RE = r"_(\d+)_(\d+)_(\d+)\.txt$"


def _check_file_sizes(spark: SparkSession, pattern: str, max_file_bytes: int) -> None:
    """Fail fast (with every offender listed) if any file matching
    ``pattern`` exceeds the wholetext one-row-per-file bound. Uses the
    Hadoop FileSystem of the path, so local, HDFS and object-store URIs
    all work; listing is a metadata operation, no data is read."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(pattern)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    statuses = fs.globStatus(jpath)
    if statuses is None:
        return  # no match: let the text source raise its own clear error
    offenders = [
        (str(s.getPath()), int(s.getLen()))
        for s in statuses
        if s.isFile() and int(s.getLen()) > max_file_bytes
    ]
    if offenders:
        listing = ", ".join(f"{p} ({n / 2**20:.0f} MB)" for p, n in offenders)
        raise ValueError(
            f"{len(offenders)} UCR file(s) exceed max_file_bytes="
            f"{max_file_bytes} ({max_file_bytes / 2**20:.0f} MB): {listing}."
            " wholetext materializes a whole file per task, so oversized"
            " series must be split into per-segment files (the chunked"
            " matrix-profile path consumes segments natively) or ingested"
            " line-per-row with an explicit position column; raise"
            " max_file_bytes only if executors have the task memory for it"
        )


def load_ucr_directory(
    spark: SparkSession, path: str, max_file_bytes: int = 256 << 20
) -> DataFrame:
    """Long form over every UCR file in ``path`` (a directory, or one
    ``.txt`` archive file — the per-dataset unit the reference's
    ``from_directory`` enumerates):
    (series_id, pos, value, train_split, anomaly_start, anomaly_stop,
    is_train, label).

    SCALE BOUND: ``wholetext`` materializes each file as ONE row (one
    task, one JVM string) — that is what preserves line order, which IS
    the time axis, and it is the right shape for the archive's
    file-per-series layout (the reference's ``np.loadtxt`` holds the
    same bytes in one process anyway). It caps the usable file size at
    executor-task memory, so files are checked against
    ``max_file_bytes`` (default 256 MB ≈ 25M float lines, 100x the
    largest real UCR series) BEFORE the scan and oversized ones fail
    fast with a clear message instead of OOMing an executor mid-job.
    A multi-GB single series does not fit this source's contract —
    split it into per-segment files (the chunked-MP path consumes
    segments natively) or ingest via a line-per-row format that carries
    an explicit position column."""
    # NOTE: must be the wholetext= kwarg — .option("wholetext", ...) is
    # silently ignored by the text source in Spark 4.1
    pattern = path if path.endswith(".txt") else f"{path}/*.txt"
    _check_file_sizes(spark, pattern, max_file_bytes)
    raw = (
        spark.read.text(pattern, wholetext=True)
        .select(
            F.input_file_name().alias("file"),
            F.col("value").alias("content"),
        )
    )
    meta = raw.select(
        F.regexp_extract("file", r"([^/]+)\.txt$", 1).alias("series_id"),
        F.regexp_extract("file", _NAME_RE, 1).cast("long").alias("train_split"),
        F.regexp_extract("file", _NAME_RE, 2).cast("long").alias("anomaly_start"),
        F.regexp_extract("file", _NAME_RE, 3).cast("long").alias("anomaly_stop"),
        "content",
    )
    exploded = meta.select(
        "series_id", "train_split", "anomaly_start", "anomaly_stop",
        F.posexplode(
            F.split(F.trim(F.col("content")), r"\s*\n\s*")
        ).alias("pos", "line"),
    ).filter(F.length("line") > 0)
    return exploded.select(
        "series_id",
        F.col("pos").cast("long").alias("pos"),
        F.col("line").cast("double").alias("value"),
        "train_split", "anomaly_start", "anomaly_stop",
        (F.col("pos") < F.col("train_split")).alias("is_train"),
        (
            (F.col("pos") >= F.col("anomaly_start"))
            & (F.col("pos") < F.col("anomaly_stop"))
        ).cast("int").alias("label"),
    )


def ucr_as_datasets(long_form: DataFrame) -> DataFrame:
    """The reference's DataSet shape (data/DataSet.py:14-107) as one row
    per series: train/test arrays + aligned test labels."""
    return (
        long_form.groupBy(
            "series_id", "train_split", "anomaly_start", "anomaly_stop"
        )
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("is_train"), F.struct("pos", "value"))
                )
            ).alias("_tr"),
            F.array_sort(
                F.collect_list(
                    F.when(~F.col("is_train"), F.struct("pos", "value", "label"))
                )
            ).alias("_te"),
        )
        .select(
            "series_id", "train_split", "anomaly_start", "anomaly_stop",
            F.expr("transform(_tr, s -> s.value)").alias("x_train"),
            F.expr("transform(_te, s -> s.value)").alias("x_test"),
            F.expr("transform(_te, s -> s.label)").alias("y_test"),
        )
    )


def ucr_dataset(spark: SparkSession, path: str, quantize: int = 1000):
    """A UCR directory as a :class:`workflow.components.DataSet`:
    train/test splits become canonical arrays frames (values quantized
    to integer milli-units, the engine's token convention), test labels
    become the long-form truth — so the component machinery
    (Pipeline.fit on the NORMAL train split, decision_function +
    metrics on test, the reference's semi-supervised flow,
    Workflow.py:426-433) runs end-to-end on the archive format."""
    from dtaianomaly_spark.workflow.components import DataSet

    lf = load_ucr_directory(spark, path)

    from dtaianomaly_spark.sources.corpus import long_to_arrays

    def arrays_of(cond, rebase):
        return long_to_arrays(
            lf.filter(cond).select(
                F.col("series_id").alias("doc_id"),
                (F.col("pos") - rebase).alias("pos"),
                F.expr(f"CAST(round(value * {quantize}) AS INT)").alias("value"),
            )
        )

    X_test = arrays_of(~F.col("is_train"), F.col("train_split"))
    y_test = lf.filter(~F.col("is_train")).select(
        F.col("series_id").alias("doc_id"),
        (F.col("pos") - F.col("train_split")).cast("long").alias("pos"),
        F.col("label").alias("truth"),
    )
    has_train = lf.filter("is_train").limit(1).count() > 0
    X_train = arrays_of(F.col("is_train"), F.lit(0)) if has_train else None
    return DataSet(X_test, y_test, X_train=X_train)

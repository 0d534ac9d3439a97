"""Reproducible error logs for grid cells: the reference's ``log_error``
(workflow/error_logging.py:10-95) writes a ``.err`` file whose top half
is the commented traceback and whose bottom half is a RUNNABLE script
reconstructing the failing cell. The canonical component strings
(components.initialization_call_string) make the reconstruction exact —
the same property the reference gets from PrettyPrintable."""

from __future__ import annotations

import datetime
import os
import traceback


def log_error(
    error_log_path: str,
    exception: Exception,
    source,
    det_name: str,
    det_kwargs: dict,
    pp_entry=None,
) -> str:
    """Write ``<Detector>-<timestamp>.err`` under ``error_log_path``
    (created if missing) and return the file path."""
    os.makedirs(error_log_path, exist_ok=True)
    base = det_name or "cell"
    # O_CREAT|O_EXCL reserves the name atomically — concurrent grid
    # threads (n_jobs > 1) failing in the same second must not clobber
    # each other's repro scripts
    n = 0
    while True:
        now = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        suffix = f"-{n}" if n else ""
        file_path = f"{error_log_path}/{base}-{now}{suffix}.err"
        try:
            fd = os.open(file_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            break
        except FileExistsError:
            n += 1

    msg = (
        "An error occurred while running this grid cell!\n"
        "Code to reproduce the error is at the bottom of this error-log.\n\n"
        "Traceback (most recent call last):\n\n"
        + "".join(traceback.format_tb(exception.__traceback__))
        + f"\n{type(exception).__name__}: {exception}"
    )
    commented = "# " + msg.replace("\n", "\n# ")

    pp_repr = repr(pp_entry if pp_entry is not None else "Identity")
    # source reconstruction: a plain string is the token-corpus sf dir;
    # a type-tagged dict (UCRLoader/...) replays through the grid's own
    # dataloader interpreter so the repro uses the REAL source, not the
    # display name
    if isinstance(source, str):
        src_code = f"""arrays = C.token_arrays(spark, {source!r})
base_long = C.token_long_form(spark, {source!r}).withColumn(
    "truth", F.expr("CASE WHEN " + grid.TRUTH_SPIKE + " THEN 1 ELSE 0 END")
)"""
    else:
        src_code = (
            "_, arrays, base_long = grid.Workflow([], [], [], [], [])."
            f"_source_frames(spark, {source!r})"
        )
    script = f"""{commented}

from dtaianomaly_spark.session import get_spark
from dtaianomaly_spark.sources import corpus as C
from dtaianomaly_spark.workflow.components import *  # noqa: F403
from dtaianomaly_spark.workflow import grid

from pyspark.sql import functions as F

spark = get_spark()
{src_code}

_, pp_fn = grid.build_preprocessor({pp_repr})
pp_long = pp_fn(base_long)
pp_arrays = grid._long_to_arrays(pp_long)

detector = grid.build_detector({det_name!r}, {det_kwargs!r})
detector.fit(pp_arrays)
detector.decision_function(pp_arrays).show()
"""
    with open(file_path, "w") as f:
        f.write(script)
    return file_path

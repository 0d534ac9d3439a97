"""Parametrized contract test over every detector query (the engine's
analog of the reference's tests/anomaly_detection/test_detectors.py:22-80
fixture sweep): per-observation score for every position, finite values,
deterministic across runs."""

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from dtaianomaly_spark.sources import corpus as C

SF_DIR = "/root/testdata/sf0.001"

# motif/discord are top-k EXTRACTION reports (k rows per series, covered
# by their own naive-matrix oracle in test_matrix_profile_params.py) —
# the per-observation score contract below applies to the scorer family
DET_QUERIES = sorted(
    k for k in E.queries()
    if k.startswith("det_")
    and k not in ("det_motif_topk", "det_discord_topk",
                  "det_shesd_report", "det_pelt_report",
                  "det_pattern_topk")
)


@pytest.fixture(scope="module")
def n_obs(spark):
    return (
        C.token_arrays(spark, SF_DIR).agg(F.sum("n_tok")).collect()[0][0]
    )


@pytest.fixture(scope="module")
def n_windows_32(spark):
    return (
        C.token_arrays(spark, SF_DIR)
        .selectExpr("sum(n_tok - 32 + 1)")
        .collect()[0][0]
    )


@pytest.mark.parametrize("name", DET_QUERIES)
def test_detector_scores_complete_and_finite(spark, name, n_obs, n_windows_32):
    if name in ("det_matrix_profile_dist", "det_matrix_profile_mv_dist"):
        n_obs = n_windows_32  # per-WINDOW profile, not per-observation
    df = E.queries()[name](spark, SF_DIR)
    value_col = [c for c in df.columns if c not in ("doc_id", "pos")][0]
    agg = df.agg(
        F.count("*").alias("n"),
        F.sum(
            F.expr(f"CASE WHEN isnan({value_col}) OR {value_col} IS NULL THEN 1 ELSE 0 END")
        ).alias("bad"),
    ).collect()[0]
    assert agg["n"] == n_obs
    assert agg["bad"] == 0

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_demonstration_time_series():
    """The reference's demonstration series (simple_time_series.py:16-37):
    seed-42 noisy sine of length 1400 with a depressed valley at [920, 965)."""
    np.random.seed(42)
    X = np.sin(np.linspace(0, 25 * np.pi, 1400) + 2)
    X += np.random.normal(0, 0.1, X.shape)
    y = np.zeros(shape=X.shape[0])
    X[920:965] -= 0.5
    y[920:965] = 1
    return X, y


@pytest.fixture(scope="session")
def univariate_time_series():
    return make_demonstration_time_series()[0]


@pytest.fixture(scope="session")
def spark():
    from dtaianomaly_spark.session import get_spark

    s = get_spark(app_name="pytest", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()

"""DTW kernels + the UCR-Suite-shaped Spark search: the banded DP is
pinned against an independent full-matrix DP, LB_Keogh admissibility is
property-tested, the Spark PAA/z-norm/LB stages are cross-checked
against the NumPy kernels, the pruned search is replayed bit-for-bit
from its contract (LB top-m -> exact DTW top-k), and the m >= corpus
path equals brute force."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dtaianomaly_spark.kernels import dtw as DTW  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def _rand(n, seed):
    return np.random.RandomState(seed).normal(size=n)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n,m", [(40, 40), (40, 55), (7, 31)])
def test_banded_full_width_equals_reference_dp(seed, n, m):
    a, b = _rand(n, seed), _rand(m, seed + 100)
    wide = DTW.dtw_banded(a, b, band=max(n, m))
    assert wide == pytest.approx(DTW.dtw_full(a, b), rel=1e-12)


def test_band_is_a_constraint():
    # a narrow band can only RAISE the optimal path cost
    a, b = _rand(64, 3), _rand(64, 4)
    costs = [DTW.dtw_banded(a, b, band=r) for r in (1, 4, 16, 64)]
    assert all(x >= y - 1e-12 for x, y in zip(costs, costs[1:]))
    assert costs[-1] == pytest.approx(DTW.dtw_full(a, b), rel=1e-12)


def test_dtw_identity_and_shift():
    a = _rand(50, 7)
    assert DTW.dtw_banded(a, a, band=5) == 0.0
    # a 2-step circular shift is recoverable inside a radius-4 band:
    # DTW must beat the rigid Euclidean alignment
    b = np.roll(a, 2)
    rigid = float(((a - b) ** 2).sum())
    assert DTW.dtw_banded(a, b, band=4) < rigid


@pytest.mark.parametrize("seed", range(6))
def test_lb_keogh_is_admissible(seed):
    band = 6
    q, c = _rand(48, seed), _rand(48, seed + 50)
    u, low = DTW.envelope(q, band)
    lb = DTW.lb_keogh(c, u, low)
    assert lb <= DTW.dtw_banded(q, c, band) + 1e-12


def test_envelope_matches_naive():
    q = _rand(30, 11)
    u, low = DTW.envelope(q, 4)
    for i in range(30):
        seg = q[max(i - 4, 0):min(i + 5, 30)]
        assert u[i] == seg.max() and low[i] == seg.min()


def test_paa_znorm_linspace_boundaries_and_constant():
    x = np.arange(10, dtype=float)
    seg = DTW.paa_znorm(x, 4)
    assert seg.shape == (4,)
    # boundaries 0,2,5,7,10 -> means 0.5, 3, 5.5, 8 then z-normed
    raw = np.array([0.5, 3.0, 5.5, 8.0])
    z = (raw - raw.mean()) / np.sqrt((raw**2).mean() - raw.mean() ** 2)
    np.testing.assert_allclose(seg, z, rtol=1e-12)
    assert np.all(DTW.paa_znorm(np.full(100, 3.0), 8) == 0.0)
    # short series: no reduction, straight z-norm
    assert DTW.paa_znorm(np.array([1.0, 2.0]), 8).shape == (2,)


def test_dtw_validates_empty():
    with pytest.raises(ValueError):
        DTW.dtw_banded(np.array([]), np.array([1.0]), band=1)


@pytest.fixture(scope="module")
def znorm_map(spark):
    """doc_id -> PAA+z-normalized kernel arrays for the test corpus."""
    from dtaianomaly_spark.sources.corpus import token_arrays

    rows = token_arrays(spark, SF_DIR).collect()
    return {
        r.doc_id: DTW.paa_znorm(np.asarray(r.tokens, dtype=np.float64), 64)
        for r in rows
    }


def test_spark_full_m_equals_bruteforce(spark, znorm_map):
    """With m >= corpus size the prune is a no-op and the operator IS
    the exact brute-force banded-DTW top-k."""
    from dtaianomaly_spark.pipelines.similarity import series_dtw_topk
    from dtaianomaly_spark.sources.corpus import token_arrays

    got = series_dtw_topk(
        token_arrays(spark, SF_DIR), n_queries=2, k=5, m=10_000
    ).collect()
    for qid in sorted(znorm_map)[:2]:
        q = znorm_map[qid]
        exact = sorted(
            (DTW.dtw_banded(q, c, 8), did)
            for did, c in znorm_map.items() if did != qid
        )[:5]
        mine = sorted((r.rank, r.doc_id, r.dtw) for r in got if r.qid == qid)
        assert [d for _, d, _ in mine] == [d for _, d in exact]
        for (_, _, dv), (ev, _) in zip(mine, exact):
            assert dv == pytest.approx(ev, rel=1e-9)


def test_spark_pruned_matches_contract_replay(spark, znorm_map):
    """The default pruned search equals a bit-for-bit NumPy replay of
    its contract: LB-rank -> top-m candidates -> exact DTW -> top-k."""
    from dtaianomaly_spark.pipelines.similarity import series_dtw_topk
    from dtaianomaly_spark.sources.corpus import token_arrays

    m, k = 16, 4
    got = series_dtw_topk(
        token_arrays(spark, SF_DIR), n_queries=2, k=k, m=m
    ).collect()
    for qid in sorted(znorm_map)[:2]:
        q = znorm_map[qid]
        u, low = DTW.envelope(q, 8)
        by_lb = sorted(
            (DTW.lb_keogh(c, u, low), did)
            for did, c in znorm_map.items() if did != qid
        )[:m]
        topk = sorted(
            (DTW.dtw_banded(q, znorm_map[did], 8), did)
            for _, did in by_lb
        )[:k]
        mine = sorted((r.rank, r.doc_id) for r in got if r.qid == qid)
        assert [d for _, d in mine] == [d for _, d in topk]


def test_spark_lb_matches_kernel(spark, znorm_map):
    """The SQL LB_Keogh fold and the HOF envelopes agree with the NumPy
    kernels on real series (same band, same candidates)."""
    from dtaianomaly_spark.pipelines.similarity import series_dtw_topk
    from dtaianomaly_spark.sources.corpus import token_arrays

    got = series_dtw_topk(
        token_arrays(spark, SF_DIR), n_queries=2, k=3, m=8
    ).collect()
    for r in got:
        u, low = DTW.envelope(znorm_map[r.qid], 8)
        lb = DTW.lb_keogh(znorm_map[r.doc_id], u, low)
        assert r.lb == pytest.approx(lb, rel=1e-9, abs=1e-12)
        assert r.lb <= r.dtw + 1e-9

"""The driver adjudicates only the first 50 queries() entries per round.
The ordering is least-recently-adjudicated-first over the CORRECTNESS
history, which must guarantee — by construction, from ANY history state —
that every oracle query is driver-adjudicated within any
ceil(n_oracle / 50) consecutive rounds (2 rounds up to 100 oracle
queries, 3 up to 150 — the current count is recorded in SURVEY.md).
These tests pin the TIGHT window with a simulation (no Spark)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E

DRIVER_CAP = 50


def _order(keys, oracle, hist):
    return sorted(keys, key=lambda k: (k not in oracle, hist.get(k, 0), k))


def test_every_oracle_query_adjudicated_within_window():
    """The tight window is w = ceil(n_oracle / DRIVER_CAP): the rule
    adjudicates 50 distinct least-recently-checked oracle keys per
    round, so any w consecutive rounds cover all n. Proven here from
    the CURRENT repo history and from adversarial histories."""
    import math

    oracle = set(E.oracle_sql().keys())
    keys = list(E.queries().keys())
    assert oracle <= set(keys)
    w = math.ceil(len(oracle) / DRIVER_CAP)
    assert w <= 3, (
        "oracle count outgrew the documented 3-round rotation window —"
        " update SURVEY's coverage claim before growing further"
    )
    histories = [
        E._adjudication_history(),
        {},  # fresh checkout, no CORRECTNESS files
        {k: 9 for k in list(sorted(oracle))[:50]},  # worst-case staleness split
    ]
    for hist in histories:
        h = dict(hist)
        start = max(h.values(), default=0) + 1
        checked_by_round = []
        for rnd in range(start, start + 2 * w):
            top = _order(keys, oracle, h)[:DRIVER_CAP]
            checked_by_round.append({k for k in top if k in oracle})
            for k in top:
                h[k] = rnd
        for i in range(len(checked_by_round) - w + 1):
            window = set().union(*checked_by_round[i:i + w])
            assert window == oracle, sorted(oracle - window)


def test_never_adjudicated_keys_lead_the_rotation():
    oracle = set(E.oracle_sql().keys())
    keys = list(E.queries().keys())
    hist = {k: 3 for k in keys if k not in ("dd_dup_clusters",)}
    order = _order(keys, oracle, hist)
    assert order[0] == "dd_dup_clusters"


def test_queries_ordering_matches_the_simulated_rule():
    """queries() must actually APPLY the rule the simulation proves."""
    oracle = set(E.oracle_sql().keys())
    hist = E._adjudication_history()
    got = list(E.queries().keys())
    assert got == _order(got, oracle, hist)
    # rows-only queries all sort after every oracle-mapped one
    n_oracle = len(oracle)
    assert all(k in oracle for k in got[:n_oracle])

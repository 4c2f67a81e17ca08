"""Exact LAP solver vs scipy.optimize.linear_sum_assignment (VERDICT item 5).

500 random cost matrices, rectangular and padded-mask aware: total assigned
cost must equal scipy's optimum, and (ties aside) the assignment indices match.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from drone_yolo_tpu.ops.lap import linear_sum_assignment


def _scipy_cost(c):
    from scipy.optimize import linear_sum_assignment as lsa

    r, col = lsa(c)
    return c[r, col].sum(), col


def test_lap_matches_scipy_500():
    """500 random rectangular cases padded into one (500, 24, 64) batch: a
    single compiled vmapped solve, which also exercises the row mask (padded
    rows) and column padding (uniform large cost, never picked)."""
    rng = np.random.default_rng(0)
    N, M = 24, 64
    cases, batch, valid = [], np.full((500, N, M), 1e5, np.float32), np.zeros((500, N), bool)
    for i in range(500):
        n = int(rng.integers(1, N))
        m = int(rng.integers(n, M))
        c = rng.random((n, m)).astype(np.float32) * rng.choice([1.0, 10.0, 100.0])
        cases.append(c)
        batch[i, :n, :m] = c
        valid[i, :n] = True

    outs = np.asarray(linear_sum_assignment(jnp.asarray(batch), jnp.asarray(valid)))
    n_exact_idx = 0
    for i, c in enumerate(cases):
        n, m = c.shape
        ours = outs[i, :n]
        assert ours.max() < m, (i, ours, m)  # padded columns never chosen
        ours_cost = c[np.arange(n), ours].sum()
        sp_cost, sp_col = _scipy_cost(c.astype(np.float64))
        assert abs(ours_cost - sp_cost) <= 1e-3 * max(1.0, abs(sp_cost)), (i, ours_cost, sp_cost)
        assert len(set(ours.tolist())) == n  # valid matching (distinct columns)
        if np.array_equal(ours, sp_col):
            n_exact_idx += 1
    # identical indices except for rare exact-cost ties
    assert n_exact_idx >= 490, n_exact_idx


def test_lap_padded_rows_do_not_compete():
    rng = np.random.default_rng(1)
    c = rng.random((3, 8, 10)).astype(np.float32)
    valid = np.array([[1, 1, 0, 0, 0, 0, 0, 0]] * 3, bool)
    out = np.asarray(linear_sum_assignment(jnp.asarray(c), jnp.asarray(valid)))
    from scipy.optimize import linear_sum_assignment as lsa

    for b in range(3):
        _, col = lsa(c[b, :2].astype(np.float64))
        got = out[b, :2]
        assert c[b, np.arange(2), got].sum() == pytest.approx(
            c[b, np.arange(2), col].sum(), abs=1e-4
        )
        assert len(set(got.tolist())) == 2


def test_hungarian_beats_greedy_on_adversarial():
    """The classic case where greedy is suboptimal: committing the global min
    forces a worse total."""
    from drone_yolo_tpu.models.rtdetr.loss import greedy_assignment, hungarian_assignment

    # rows=queries(Q=2), cols=gt(M=2): greedy picks (q0,g0)=0.0 then (q1,g1)=10;
    # optimal is (q0,g1)=1 + (q1,g0)=1 -> total 2
    cost = jnp.asarray([[[0.0, 1.0], [1.0, 10.0]]])  # (B=1, Q=2, M=2)
    mask = jnp.ones((1, 2))
    g = np.asarray(greedy_assignment(cost, mask))[0]
    h = np.asarray(hungarian_assignment(cost, mask))[0]
    c = np.asarray(cost)[0]
    greedy_total = c[g[0], 0] + c[g[1], 1]
    hung_total = c[h[0], 0] + c[h[1], 1]
    assert hung_total == pytest.approx(2.0)
    assert greedy_total > hung_total

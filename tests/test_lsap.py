"""On-device LSAP vs scipy.optimize.linear_sum_assignment."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment as scipy_lsap

from class_query_vad_tpu.ops import linear_sum_assignment


def _total(cost, col4row, valid):
    col4row = np.asarray(col4row)
    valid = np.asarray(valid)
    return sum(
        cost[i, col4row[i]]
        for i in range(min(len(col4row), cost.shape[0]))
        if valid[i] and col4row[i] < cost.shape[1]
    )


@pytest.mark.parametrize("n,m", [(15, 3), (15, 15), (5, 5), (15, 30), (4, 9)])
def test_matches_scipy_optimum(rng, n, m):
    for trial in range(5):
        cost = rng.normal(size=(n, m)).astype(np.float32) * 10
        col4row, valid = linear_sum_assignment(jnp.asarray(cost))
        ri, ci = scipy_lsap(cost)
        want = cost[ri, ci].sum()
        got = _total(cost, col4row, valid)
        assert int(np.asarray(valid).sum()) == min(n, m)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_masked_columns(rng):
    """Dynamic n_valid_cols must reproduce scipy on the real submatrix."""
    n, m_max = 15, 32
    for n_valid in (1, 3, 7, 15):
        cost = rng.normal(size=(n, m_max)).astype(np.float32) * 5
        col4row, valid = linear_sum_assignment(jnp.asarray(cost), n_valid_cols=n_valid)
        ri, ci = scipy_lsap(cost[:, :n_valid])
        want = cost[:, :n_valid][ri, ci].sum()
        got = _total(cost[:, :n_valid], col4row, valid)
        assert int(np.asarray(valid).sum()) == min(n, n_valid)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_exact_pairs_unique(rng):
    cost = rng.normal(size=(8, 8)).astype(np.float32)
    col4row, valid = linear_sum_assignment(jnp.asarray(cost))
    cols = np.asarray(col4row)[np.asarray(valid)]
    assert len(set(cols.tolist())) == len(cols)

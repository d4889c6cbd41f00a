"""On-device linear sum assignment (Hungarian matching).

The reference matcher ships every cost matrix to the CPU and calls
``scipy.optimize.linear_sum_assignment`` per batch element / per frame
(/root/reference/models/detr/matcher.py:73-77,172-174,251-252) — a host sync
in the middle of every training step.  Here the shortest-augmenting-path
(Jonker–Volgenant) algorithm runs *inside* jit: costs are padded to a static
square size, solved with ``lax.while_loop`` / ``lax.fori_loop``, and vmapped
over the batch.  Padding columns/rows carry a large constant cost, which
provably preserves the rectangular optimum (every full assignment pays the
same constant for dummies, and each extra real↔real match strictly reduces
the total), so the result matches scipy on the real submatrix.

Exactness is verified against scipy in tests/test_lsap.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

PAD_COST = 1.0e4
# plain python float: a module-level jnp scalar would initialize the jax
# backend at IMPORT time (and hang when the TPU tunnel is down)
_INF = float("inf")


def _augment_row(carry, cur_row, cost):
    """Find an augmenting path from `cur_row` and update duals/assignment."""
    u, v, row4col, col4row = carry
    k = cost.shape[0]

    def cond(state):
        _, _, _, _, _, sink, _ = state
        return sink < 0

    def body(state):
        i, min_val, sr, sc, shortest, sink, path = state
        sr = sr.at[i].set(True)
        reduced = min_val + cost[i] - u[i] - v
        better = (~sc) & (reduced < shortest)
        shortest = jnp.where(better, reduced, shortest)
        path = jnp.where(better, i, path)

        masked = jnp.where(sc, _INF, shortest)
        j = jnp.argmin(masked)
        min_val = masked[j]
        sc = sc.at[j].set(True)
        nxt = row4col[j]
        sink = jnp.where(nxt < 0, j, -1)
        return (nxt, min_val, sr, sc, shortest, sink, path)

    init = (
        cur_row,
        jnp.float32(0.0),
        jnp.zeros(k, bool),
        jnp.zeros(k, bool),
        jnp.full((k,), _INF),
        jnp.int32(-1),
        jnp.full((k,), -1, jnp.int32),
    )
    _, min_val, sr, sc, shortest, sink, path = jax.lax.while_loop(cond, body, init)

    # Dual updates (standard JV): u for visited rows, v for scanned columns.
    u = u.at[cur_row].add(min_val)
    # For every other visited row i, it was reached via its assigned column.
    row_cols = col4row  # col assigned to row i (or -1)
    visited_other = sr & (jnp.arange(k) != cur_row)
    delta_rows = jnp.where(
        visited_other,
        min_val - shortest[jnp.clip(row_cols, 0, k - 1)],
        0.0,
    )
    u = u + delta_rows
    v = jnp.where(sc, v + shortest - min_val, v)

    # Augment: walk predecessors from the sink back to cur_row.
    def aug_cond(state):
        j, _, _ = state
        return j >= 0

    def aug_body(state):
        j, r4c, c4r = state
        i = path[j]
        r4c = r4c.at[j].set(i)
        prev_j = c4r[i]
        c4r = c4r.at[i].set(j)
        return (prev_j, r4c, c4r)

    _, row4col, col4row = jax.lax.while_loop(
        aug_cond, aug_body, (sink, row4col, col4row)
    )
    return (u, v, row4col, col4row)


@partial(jax.jit, static_argnames=())
def _solve_square(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve K×K LSAP; returns col4row [K] (column matched to each row)."""
    k = cost.shape[0]
    carry = (
        jnp.zeros(k, jnp.float32),
        jnp.zeros(k, jnp.float32),
        jnp.full((k,), -1, jnp.int32),
        jnp.full((k,), -1, jnp.int32),
    )

    def body(i, carry):
        return _augment_row(carry, i, cost)

    _, _, _, col4row = jax.lax.fori_loop(0, k, body, carry)
    return col4row


def linear_sum_assignment(
    cost: jnp.ndarray,
    n_valid_cols: jnp.ndarray | int | None = None,
    n_valid_rows: jnp.ndarray | int | None = None,
):
    """Masked rectangular LSAP.

    cost: [N, M] float.  Entries in columns >= n_valid_cols / rows >=
    n_valid_rows are ignored (replaced by PAD_COST).  Returns
    (col4row [K], valid [K]) over the padded square size K = max(N, M):
    ``col4row[i]`` is the column matched to row i, ``valid[i]`` marks real
    row-column matches.
    """
    n, m = cost.shape
    k = max(n, m)
    if n_valid_cols is None:
        n_valid_cols = m
    if n_valid_rows is None:
        n_valid_rows = n

    rows = jnp.arange(k)
    cols = jnp.arange(k)
    row_ok = rows < n_valid_rows
    col_ok = cols < n_valid_cols

    sq = jnp.full((k, k), PAD_COST, jnp.float32)
    sq = sq.at[:n, :m].set(cost.astype(jnp.float32))
    sq = jnp.where(row_ok[:, None] & col_ok[None, :], sq, PAD_COST)

    col4row = _solve_square(sq)
    valid = row_ok & (col4row < n_valid_cols)
    return col4row, valid


def batched_linear_sum_assignment(cost, n_valid_cols=None, n_valid_rows=None):
    """vmap of linear_sum_assignment over a leading batch axis."""
    fn = lambda c, nc, nr: linear_sum_assignment(c, nc, nr)
    b = cost.shape[0]
    if n_valid_cols is None:
        n_valid_cols = jnp.full((b,), cost.shape[2], jnp.int32)
    if n_valid_rows is None:
        n_valid_rows = jnp.full((b,), cost.shape[1], jnp.int32)
    return jax.vmap(fn)(cost, n_valid_cols, n_valid_rows)

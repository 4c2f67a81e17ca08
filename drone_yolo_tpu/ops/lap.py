"""Exact linear-sum-assignment (Hungarian) on device, jit/vmap-compatible.

Replaces the reference's host-side `scipy.optimize.linear_sum_assignment`
(`ultralytics/models/utils/ops.py:12`, HungarianMatcher) — host callbacks are
unavailable inside jit on this TPU runtime, so the matcher must run on device.

Algorithm: successive shortest augmenting paths with dual potentials (the
O(n·m^2) dense Hungarian; same family as scipy's LAPJV). All inner work is
vectorized over the m columns; the augmenting search is a `lax.while_loop`
bounded by m+1 iterations (each step marks one column used). Exact for float
costs up to arithmetic precision — not an approximation like greedy matching.

Rows are the "small" side (n <= m required; for DETR: rows = padded GT slots,
columns = queries). Invalid (padded) rows are skipped entirely via `lax.cond`,
so they never compete for columns.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _solve_single(cost, row_valid):
    """cost: (n, m) float, n <= m; row_valid: (n,) bool.

    Returns (n,) int32 column assigned to each valid row (padded rows get 0;
    callers must mask them out).
    """
    n, m = cost.shape
    if n > m:
        raise ValueError(f"LAP requires n <= m, got {cost.shape}")
    big = jnp.asarray(jnp.finfo(jnp.float32).max / 4, jnp.float32)
    # 1-indexed layout with a virtual row 0 / column 0 (e-maxx formulation)
    a = jnp.pad(cost.astype(jnp.float32), ((1, 0), (1, 0)))

    def process_row(i, carry):
        u, v, p = carry

        def do_row(carry):
            u, v, p = carry
            p = p.at[0].set(i + 1)
            minv = jnp.full((m + 1,), big, jnp.float32)
            way = jnp.zeros((m + 1,), jnp.int32)
            used = jnp.zeros((m + 1,), bool)

            def cond(s):
                u, v, p, minv, way, used, j0 = s
                return p[j0] != 0

            def body(s):
                u, v, p, minv, way, used, j0 = s
                used = used.at[j0].set(True)
                i0 = p[j0]
                cur = a[i0] - u[i0] - v  # reduced cost row (m+1,)
                upd = (~used) & (cur < minv)
                minv = jnp.where(upd, cur, minv)
                way = jnp.where(upd, j0, way)
                cand = jnp.where(used, big, minv).at[0].set(big)
                j1 = jnp.argmin(cand).astype(jnp.int32)
                delta = cand[j1]
                # dual update: matched rows of used columns rise, used columns fall
                u = u.at[p].add(jnp.where(used, delta, 0.0))
                v = v - jnp.where(used, delta, 0.0)
                minv = minv - jnp.where(used, 0.0, delta)
                return u, v, p, minv, way, used, j1

            u, v, p, minv, way, used, j0 = lax.while_loop(
                cond, body, (u, v, p, minv, way, used, jnp.int32(0))
            )

            # augment along the alternating path back to the virtual column
            def acond(s):
                _, j0 = s
                return j0 != 0

            def abody(s):
                p, j0 = s
                j1 = way[j0]
                p = p.at[j0].set(p[j1])
                return p, j1

            p, _ = lax.while_loop(acond, abody, (p, j0))
            return u, v, p

        return lax.cond(row_valid[i], do_row, lambda c: c, (u, v, p))

    u0 = jnp.zeros((n + 1,), jnp.float32)
    v0 = jnp.zeros((m + 1,), jnp.float32)
    p0 = jnp.zeros((m + 1,), jnp.int32)  # p[j] = row matched to column j (1-indexed)
    _, _, p = lax.fori_loop(0, n, process_row, (u0, v0, p0))

    # invert p: column per row. Unmatched columns (p == 0) map to the OOB index
    # n so mode="drop" discards them (a raw -1 would WRAP in JAX scatter).
    rows = jnp.where(p[1:] > 0, p[1:] - 1, n)
    cols = jnp.arange(m, dtype=jnp.int32)
    ans = jnp.zeros((n,), jnp.int32)
    ans = ans.at[rows].set(cols, mode="drop")
    return ans


def linear_sum_assignment(cost, row_valid=None):
    """Batched exact LAP: cost (B, n, m) with n <= m, row_valid (B, n) bool.

    Returns (B, n) int32: the column assigned to each row (minimum total cost
    over valid rows). Exactness is property-tested against
    scipy.optimize.linear_sum_assignment in tests/test_lap.py.
    """
    if row_valid is None:
        row_valid = jnp.ones(cost.shape[:-1], bool)
    return jax.vmap(_solve_single)(cost, row_valid.astype(bool))

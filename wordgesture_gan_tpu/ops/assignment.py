"""Optimal assignment for Wasserstein-style matched distances.

The reference uses scipy's Hungarian solver on the host
(/root/reference/src/gan/evaluation.py:338,358). Two paths here:

* ``hungarian_matching`` — exact, host-side (scipy), used at reference eval
  scale (n ≈ 2000, sub-second).
* ``sinkhorn_matching_cost`` — entropy-regularized optimal transport fully
  on device, for the 100k-scale eval config (BASELINE.json config 4) where
  O(n^3) Hungarian is infeasible. With small epsilon it converges to the
  exact assignment cost from above (validated against scipy in tests).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hungarian_matching(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Exact minimum-cost perfect matching (row_ind, col_ind)."""
    from scipy.optimize import linear_sum_assignment

    return linear_sum_assignment(cost)


def matched_mean_distance(cost: np.ndarray) -> float:
    """Mean cost along the optimal assignment — the 'Wasserstein' scalar the
    reference reports (evaluation.py:339,359)."""
    r, c = hungarian_matching(cost)
    return float(cost[r, c].mean())


def sinkhorn_matching_cost(
    cost: jnp.ndarray,
    epsilon: float = 0.01,
    n_iters: int = 500,
) -> jnp.ndarray:
    """Entropy-regularized OT cost between uniform marginals, on device.

    Log-domain Sinkhorn: u, v updates via logsumexp; returns
    <P, C> for the resulting transport plan. As epsilon → 0 this approaches
    the Hungarian matched mean. All ops are (n, m) matrix updates — VPU/MXU
    friendly and trivially shardable over rows.
    """
    n, m = cost.shape
    log_mu = -jnp.log(n) * jnp.ones((n,))
    log_nu = -jnp.log(m) * jnp.ones((m,))
    neg_c = -cost / epsilon

    def body(carry, _):
        f, g = carry
        # f_i = eps * (log mu_i - logsumexp_j((g_j - C_ij)/eps))
        f = epsilon * (log_mu - jax.scipy.special.logsumexp(neg_c + g[None, :] / epsilon, axis=1))
        g = epsilon * (log_nu - jax.scipy.special.logsumexp(neg_c + f[:, None] / epsilon, axis=0))
        return (f, g), None

    (f, g), _ = jax.lax.scan(body, (jnp.zeros((n,)), jnp.zeros((m,))), None, length=n_iters)
    log_plan = (f[:, None] + g[None, :]) / epsilon + neg_c
    plan = jnp.exp(log_plan)
    # With uniform 1/n row marginals the plan puts total mass 1 on matched
    # pairs, so <P, C> IS the mean matched distance.
    return jnp.sum(plan * cost)

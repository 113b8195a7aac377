"""Device-side Welford running statistics over the averaging window.

The reference reads u/rho/T back to the host every sampled step and
accumulates there (setup.cpp:4411-4494) — expensive PCIe traffic.  Here the
accumulator lives on device as a jitted update; only the final means/M2s
ever cross to the host.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..lbm.state import LBMState


class AvgState(NamedTuple):
    count: jnp.ndarray        # () int32
    mean_u: jnp.ndarray       # (3, Z, Y, X)
    m2_u: jnp.ndarray         # (3, Z, Y, X) sum of squared deviations
    mean_rho: jnp.ndarray     # (Z, Y, X)
    mean_T: Optional[jnp.ndarray] = None


def init_avg(shape, thermal: bool) -> AvgState:
    z = jnp.zeros(shape, jnp.float32)
    return AvgState(
        count=jnp.zeros((), jnp.int32),
        mean_u=jnp.zeros((3, *shape), jnp.float32),
        m2_u=jnp.zeros((3, *shape), jnp.float32),
        mean_rho=z,
        mean_T=z if thermal else None,
    )


@jax.jit
def welford_update(avg: AvgState, state: LBMState) -> AvgState:
    n = avg.count + 1
    inv_n = 1.0 / n.astype(jnp.float32)
    delta = state.u - avg.mean_u
    mean_u = avg.mean_u + delta * inv_n
    m2_u = avg.m2_u + delta * (state.u - mean_u)
    mean_rho = avg.mean_rho + (state.rho - avg.mean_rho) * inv_n
    mean_T = avg.mean_T
    if mean_T is not None and state.T is not None:
        mean_T = mean_T + (state.T - mean_T) * inv_n
    return AvgState(count=n, mean_u=mean_u, m2_u=m2_u,
                    mean_rho=mean_rho, mean_T=mean_T)


def variance_u(avg: AvgState) -> jnp.ndarray:
    """(3, Z, Y, X) per-component velocity variance (population)."""
    n = jnp.maximum(avg.count, 1).astype(jnp.float32)
    return jnp.maximum(avg.m2_u / n, 0.0)

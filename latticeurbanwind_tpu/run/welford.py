"""Device-side Welford running statistics over the averaging window.

The reference reads u/rho/T back to the host every sampled step and
accumulates there (setup.cpp:4411-4494) — expensive PCIe traffic.  Here the
accumulator lives on device as a jitted update; only the final means/M2s
ever cross to the host.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..lbm.state import LBMState


class AvgState(NamedTuple):
    count: jnp.ndarray        # () int32
    mean_u: jnp.ndarray       # (3, Z, Y, X)
    m2_u: jnp.ndarray         # (Z, Y, X) sum of squared deviations, SUMMED
    #                           over the 3 components: every derived output
    #                           (tke, TI, TLS — run/derived.py) consumes only
    #                           the variance TRACE, and the scalar
    #                           accumulator saves 8 B/cell of HBM residency
    mean_rho: jnp.ndarray     # (Z, Y, X)
    mean_T: Optional[jnp.ndarray] = None


def init_avg(shape, thermal: bool) -> AvgState:
    # each field gets its OWN buffer: sharing one zeros array between
    # mean_rho and mean_T trips donation ("same buffer donated twice")
    return AvgState(
        count=jnp.zeros((), jnp.int32),
        mean_u=jnp.zeros((3, *shape), jnp.float32),
        m2_u=jnp.zeros(shape, jnp.float32),
        mean_rho=jnp.zeros(shape, jnp.float32),
        mean_T=jnp.zeros(shape, jnp.float32) if thermal else None,
    )


# `avg` is DONATED: without it every averaging event allocates a second
# full accumulator set (~28 B/cell) while the old one is still live — a
# transient spike that OOMs production grids.  Callers rebind
# (avg = welford_update(avg, state)), so donation is safe.
@partial(jax.jit, donate_argnums=(0,))
def welford_update(avg: AvgState, state: LBMState) -> AvgState:
    n = avg.count + 1
    inv_n = 1.0 / n.astype(jnp.float32)
    delta = state.u - avg.mean_u
    mean_u = avg.mean_u + delta * inv_n
    m2_u = avg.m2_u + (delta * (state.u - mean_u)).sum(axis=0)
    mean_rho = avg.mean_rho + (state.rho - avg.mean_rho) * inv_n
    mean_T = avg.mean_T
    if mean_T is not None and state.T is not None:
        mean_T = mean_T + (state.T - mean_T) * inv_n
    return AvgState(count=n, mean_u=mean_u, m2_u=m2_u,
                    mean_rho=mean_rho, mean_T=mean_T)


def place_avg(avg: AvgState, mesh=None) -> AvgState:
    """Commit a host-loaded accumulator (checkpoint resume returns numpy
    arrays) to device — sharded like the state when a mesh is given.
    Without this the first post-resume welford_update finds non-donatable
    host buffers, warns, and silently double-allocates the accumulator set
    (the transient spike donation exists to prevent)."""
    if avg is None:
        return None
    if mesh is None:
        return jax.device_put(avg)
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = NamedSharding(mesh, P("z", "y", "x"))
    v = NamedSharding(mesh, P(None, "z", "y", "x"))
    r = NamedSharding(mesh, P())
    return AvgState(
        count=jax.device_put(avg.count, r),
        mean_u=jax.device_put(avg.mean_u, v),
        m2_u=jax.device_put(avg.m2_u, s),
        mean_rho=jax.device_put(avg.mean_rho, s),
        mean_T=(jax.device_put(avg.mean_T, s)
                if avg.mean_T is not None else None),
    )


def variance_sum_u(avg: AvgState) -> jnp.ndarray:
    """(Z, Y, X) velocity-variance trace var_u+var_v+var_w (population)."""
    n = jnp.maximum(avg.count, 1).astype(jnp.float32)
    return jnp.maximum(avg.m2_u / n, 0.0)

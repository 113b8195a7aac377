"""On-demand field materialization: rho/u[/T] from the DDF arrays.

The performance tier steps DDFs only (ops/stream_collide.py); rho/u/T in an
LBMState are stale during stepping.  `update_fields` recomputes them — the
TPU analog of the reference's update_fields kernel (kernel.cpp:1938-2028,
invoked from the event/readback paths setup.cpp:4441-4494).  Cost: one
19-DDF read + rho/u write, paid only at event steps (unsteady VTKs, Welford
samples, probes, checkpoints).

Semantics follow the reference exactly:
  * populations are STREAMED first (the stored DDFs are post-collision;
    the physical pre-collision state of the next step is what the fields
    report), with halfway bounce-back from solid sources;
  * the Guo half-step force correction uses the global force + Coriolis
    (+ Boussinesq buoyancy), then the stability clamp — the reference skips
    the nudge/sponge forces here too;
  * TYPE_E cells report their own frozen equilibria's moments, which equal
    the prescribed BC values by construction (the reference instead skips
    them because it presets the arrays externally — same result);
  * solid cells keep their existing rho/u/T (never computed, masked in
    outputs by the fluid flag).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .lattice import C7, C19, CS, OPP7, OPP19
from .reference import _stream, moments
from .state import DynParams, LBMState, StepConfig, TYPE_E, TYPE_S, TYPE_T, decode_ddf


@partial(jax.jit, static_argnames=("config",))
def _update(state: LBMState, dyn: DynParams, config: StepConfig) -> LBMState:
    flags = state.flags
    solid = (flags & TYPE_S) != 0
    eqbc = (flags & TYPE_E) != 0

    f_own = decode_ddf(state.fi, config.storage)
    f = _stream(f_own, solid, C19, OPP19)
    rho_s, u_s = moments(f)

    fx = dyn.force.astype(jnp.float32)
    ox, oy, oz = dyn.omega_coriolis
    F = jnp.stack([
        fx[0] - 2.0 * rho_s * (oy * u_s[2] - oz * u_s[1]),
        fx[1] - 2.0 * rho_s * (oz * u_s[0] - ox * u_s[2]),
        fx[2] - 2.0 * rho_s * (ox * u_s[1] - oy * u_s[0]),
    ])

    T_new = state.T
    if config.thermal and state.gi is not None:
        tfix = (flags & TYPE_T) != 0
        g_own = decode_ddf(state.gi, config.storage)
        g = _stream(g_own, solid, C7, OPP7)
        T_stream = 1.0 + jnp.sum(g, axis=0)
        T_own = 1.0 + jnp.sum(g_own, axis=0)
        Tn = jnp.where(tfix, T_own, T_stream)
        T_new = jnp.where(solid, state.T, Tn)
        F = F - fx[:, None, None, None] * (config.beta * (Tn - config.t_avg))

    u_f = jnp.clip(u_s + F * (0.5 / rho_s), -CS, CS)

    rho_own, u_own = moments(f_own)
    rho_new = jnp.where(solid, state.rho, jnp.where(eqbc, rho_own, rho_s))
    u_new = jnp.where(solid[None], state.u, jnp.where(eqbc[None], u_own, u_f))
    return state._replace(rho=rho_new, u=u_new, T=T_new)


def update_fields(state: LBMState, config: StepConfig,
                  dyn: DynParams = None) -> LBMState:
    """Refresh rho/u[/T] from the DDFs (reference kernel.cpp:1938)."""
    if dyn is None:
        dyn = DynParams(force=jnp.zeros(3, jnp.float32),
                        omega_coriolis=jnp.zeros(3, jnp.float32))
    return _update(state, dyn, config)

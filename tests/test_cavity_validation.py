"""Lid-driven cavity Re=100 vs Ghia, Ghia & Shin (1982).

Benchmark validation the reference lacks entirely (SURVEY.md §4: no solver
physics tests exist upstream): a quasi-2D cavity (thin periodic z) driven
by an equilibrium-boundary lid, compared against the published u-velocity
profile along the vertical centerline.  Grid 48^2 converges to within
0.014 of the Ghia table; the tolerance below leaves headroom for storage
and platform jitter."""

import numpy as np

from latticeurbanwind_tpu.lbm import (
    DynParams, StepConfig, TYPE_E, TYPE_S, make_initial_state,
    make_multi_step, omega_from_nu,
)

# Ghia et al. (1982), table I, Re=100: u through the vertical centerline,
# y measured bottom wall -> lid (selected rows)
GHIA_RE100_U = {
    0.9766: 0.84123,
    0.7344: 0.00332,
    0.5000: -0.20581,
    0.2813: -0.15662,
    0.0625: -0.04192,
}


def test_lid_driven_cavity_re100_matches_ghia():
    import jax.numpy as jnp

    N, U = 48, 0.1
    L = N - 2                      # fluid span between the solid walls
    nu = U * L / 100.0             # Re = U L / nu = 100
    shape = (3, N, N)              # thin periodic z; cavity in the y-x plane
    flags = np.zeros(shape, np.uint8)
    flags[:, :, 0] = TYPE_S        # west wall
    flags[:, :, -1] = TYPE_S       # east wall
    flags[:, 0, :] = TYPE_S        # bottom
    flags[:, -1, :] = TYPE_E       # moving lid: equilibrium BC with u = U x̂
    u = np.zeros((3, *shape), np.float32)
    u[0, :, -1, :] = U
    config = StepConfig(omega=omega_from_nu(nu), collision="srt",
                        subgrid=False, storage="f32")
    state = make_initial_state(shape, config=config, u=u, flags=flags)
    run = make_multi_step(config, n_inner=500)
    dyn = DynParams(force=jnp.zeros(3), omega_coriolis=jnp.zeros(3))

    prev = None
    for _ in range(40):            # to steady state (~10k steps at 48^2)
        state = run(state, dyn)
        ux = np.asarray(state.u[0, 1, :, N // 2])
        if prev is not None and np.abs(ux - prev).max() < 2e-7:
            break
        prev = ux

    y_cells = (np.arange(N) - 0.5) / L    # wall surfaces at y=0 and y=1
    for y_t, ref in GHIA_RE100_U.items():
        got = float(np.interp(y_t, y_cells, ux / U))
        assert abs(got - ref) < 0.03, (y_t, got, ref)
    # secondary sanity: the primary vortex recirculates (negative core u)
    assert ux[N // 2] < -0.15 * U

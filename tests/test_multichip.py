"""Multi-chip sharding correctness: sharded step == single-device step.

Runs on the virtual 8-device CPU mesh (conftest).  This is the test the
reference never had: bitwise comparison of the domain-decomposed update
against the single-domain ground truth (SURVEY.md §4 implication).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latticeurbanwind_tpu.lbm import (
    DynParams, NudgeSpec, SpongeSpec, StepConfig, TYPE_E, TYPE_S,
    build_forcing, make_initial_state, make_step, omega_from_nu,
)
from latticeurbanwind_tpu.parallel import domain_mesh, shard_state, state_sharding


def _case(shape, thermal=False):
    config = StepConfig(omega=omega_from_nu(0.03), subgrid=True, thermal=thermal,
                        omega_t=1.0, storage="f32")
    rng = np.random.default_rng(7)
    Z, Y, X = shape
    u = 0.02 * rng.standard_normal((3, Z, Y, X)).astype(np.float32)
    rho = (1.0 + 0.001 * rng.standard_normal(shape)).astype(np.float32)
    flags = np.zeros(shape, dtype=np.uint8)
    flags[0] = TYPE_S
    flags[-1] = TYPE_E
    flags[:, 0, :] |= TYPE_E
    flags[:, -1, :] |= TYPE_E
    flags[:, :, 0] |= TYPE_E
    flags[:, :, -1] |= TYPE_E
    T = (1.0 + 0.01 * rng.standard_normal(shape)).astype(np.float32) if thermal else None
    state = make_initial_state(shape, config=config, rho=rho, u=u, flags=flags, T=T)
    forcing = build_forcing(shape,
                            nudge=NudgeSpec(n_cells=3, inv_tau=0.02),
                            sponge=SpongeSpec(n_cells=4, inv_tau=0.05))
    return config, state, forcing


@pytest.mark.parametrize("split", [(2, 1, 1), (2, 2, 1), (2, 2, 2)])
def test_sharded_step_matches_single(split):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    shape = (8, 8, 16)
    config, state, forcing = _case(shape)
    step = make_step(config, forcing)
    dyn = DynParams(force=jnp.array([1e-6, 0.0, 0.0]),
                    omega_coriolis=jnp.array([0.0, 1e-5, 2e-5]))

    # ground truth on one device
    ref = state
    step_j = jax.jit(step)
    for _ in range(5):
        ref = step_j(ref, dyn)

    mesh = domain_mesh(split)
    sharded = shard_state(state, mesh)
    shardings = state_sharding(mesh, thermal=False)
    step_sharded = jax.jit(step, out_shardings=shardings)
    out = sharded
    for _ in range(5):
        out = step_sharded(out, dyn)

    np.testing.assert_allclose(np.asarray(out.u), np.asarray(ref.u), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.rho), np.asarray(ref.rho), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.fi), np.asarray(ref.fi), atol=1e-6)


def test_sharded_thermal_step_matches_single():
    shape = (8, 8, 16)
    config, state, forcing = _case(shape, thermal=True)
    step = make_step(config, forcing)
    dyn = DynParams(force=jnp.zeros(3), omega_coriolis=jnp.zeros(3))

    ref = jax.jit(step)(state, dyn)
    mesh = domain_mesh((2, 2, 2))
    sharded = shard_state(state, mesh)
    out = jax.jit(step, out_shardings=state_sharding(mesh, thermal=True))(sharded, dyn)
    np.testing.assert_allclose(np.asarray(out.T), np.asarray(ref.T), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.u), np.asarray(ref.u), atol=1e-6)

"""Axis-permuted Pallas tier (ops/permute.py): z<->y transposition.

Wide-flat urban grids whose (Y, X) plane exceeds the VMEM budget run the
kernel along the y axis instead.  The lattice is isotropic, so the permuted
run must match the canonical jnp reference tier bit-close — including nudge
(face-id remap), top sponge (sublane-axis profile), thermal sponge, Coriolis
(pseudovector sign flip), and global forces.
"""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("LUW_PALLAS_INTERPRET", "1")


def test_direction_permutation_tables():
    from latticeurbanwind_tpu.lbm.lattice import C19, C7
    from latticeurbanwind_tpu.ops.permute import FACE_PERM, SIGMA19, SIGMA7

    for k in range(19):
        cx, cy, cz = C19[k]
        assert tuple(C19[SIGMA19[k]]) == (cx, cz, cy)
    for k in range(7):
        cx, cy, cz = C7[k]
        assert tuple(C7[SIGMA7[k]]) == (cx, cz, cy)
    assert np.array_equal(FACE_PERM[FACE_PERM], np.arange(6))  # involution


def test_permute_state_round_trip():
    from latticeurbanwind_tpu.lbm import StepConfig, make_initial_state, omega_from_nu
    from latticeurbanwind_tpu.ops.permute import permute_state, unpermute_state

    shape = (6, 10, 16)
    rng = np.random.default_rng(0)
    cfg = StepConfig(omega=omega_from_nu(0.02), thermal=True, storage="f32")
    u = 0.02 * rng.standard_normal((3, *shape)).astype(np.float32)
    T = (1.0 + 0.01 * rng.standard_normal(shape)).astype(np.float32)
    st = make_initial_state(shape, config=cfg, u=u, T=T)
    back = unpermute_state(permute_state(st))
    np.testing.assert_array_equal(np.asarray(back.fi), np.asarray(st.fi))
    np.testing.assert_array_equal(np.asarray(back.u), np.asarray(st.u))
    np.testing.assert_array_equal(np.asarray(back.gi), np.asarray(st.gi))


def test_permuted_with_vk_pre_step_matches_reference():
    """The VK inlet pre_step exposes a `.permuted` variant; the permuted
    tier must reproduce the canonical run including the per-step inlet
    perturbations (scatter indices and velocity components transposed)."""
    import jax
    import jax.numpy as jnp

    from latticeurbanwind_tpu.bc.vk_inlet import (
        VkConfig, build_vk_runtime, make_vk_pre_step,
    )
    from latticeurbanwind_tpu.lbm import (
        DynParams, Forcing, StepConfig, TYPE_E, TYPE_S, make_initial_state,
        omega_from_nu,
    )
    from latticeurbanwind_tpu.lbm.reference import make_step as ref_step_f
    from latticeurbanwind_tpu.lbm.stepper import make_runner

    shape = (10, 48, 64)
    cfg = StepConfig(omega=omega_from_nu(0.03), subgrid=True, storage="f32")
    flags = np.zeros(shape, np.uint8)
    flags[0] = TYPE_S
    for sl in (np.s_[:, :, 0], np.s_[:, :, -1], np.s_[:, 0, :], np.s_[:, -1, :],
               np.s_[-1, :, :]):
        flags[sl] = np.where(flags[sl] == 0, TYPE_E, flags[sl])
    u = np.zeros((3, *shape), np.float32)
    u[0] = 0.03
    u[:, (flags & TYPE_S) != 0] = 0.0
    state = make_initial_state(shape, config=cfg, u=u, flags=flags)
    vk_cfg = VkConfig(ti=0.08, L_lbm=10.0, nmodes=16, seed=7)
    rt = build_vk_runtime(vk_cfg, flags, u)
    assert rt is not None
    pre_step = make_vk_pre_step(vk_cfg, rt)
    dyn = DynParams(force=jnp.zeros(3), omega_coriolis=jnp.zeros(3))

    ref_step = jax.jit(ref_step_f(cfg, Forcing()))
    r = state
    for t in range(4):
        r = pre_step(r, t)
        r = ref_step(r, dyn)

    run, impl = make_runner(cfg, shape=shape, n_inner=4,
                            impl="pallas-permuted", donate=False,
                            pre_step=pre_step)
    assert impl == "pallas-permuted"
    p = run(state, dyn, 0)
    np.testing.assert_allclose(np.asarray(p.fi), np.asarray(r.fi), atol=3e-6)
    from latticeurbanwind_tpu.lbm.fields import update_fields

    fp_ = update_fields(p, cfg, dyn)
    fr = update_fields(r, cfg, dyn)
    np.testing.assert_allclose(np.asarray(fp_.u), np.asarray(fr.u), atol=4e-5)


@pytest.mark.parametrize("thermal", [False, True])
def test_permuted_matches_reference(thermal):
    import jax
    import jax.numpy as jnp

    from latticeurbanwind_tpu.lbm import (
        DynParams, NudgeSpec, SpongeSpec, StepConfig, TYPE_E, TYPE_S, TYPE_T,
        build_forcing, make_initial_state, omega_from_nu,
    )
    from latticeurbanwind_tpu.lbm.reference import make_step as ref_step_f
    from latticeurbanwind_tpu.lbm.stepper import make_runner

    shape = (10, 48, 64)   # permuted: (48, 10, 64)
    rng = np.random.default_rng(2)
    cfg = StepConfig(omega=omega_from_nu(0.03), subgrid=True, thermal=thermal,
                     omega_t=1.1, beta=0.002, storage="f32")
    u = 0.02 * rng.standard_normal((3, *shape)).astype(np.float32)
    rho = (1.0 + 0.001 * rng.standard_normal(shape)).astype(np.float32)
    flags = np.zeros(shape, np.uint8)
    # LUW shell contract: ground solid, all other outer faces TYPE_E
    flags[-1] = TYPE_E
    flags[:, 0, :] |= TYPE_E
    flags[:, -1, :] |= TYPE_E
    flags[:, :, 0] |= TYPE_E
    flags[:, :, -1] |= TYPE_E
    flags[0] = TYPE_S
    flags[2:5, 20:30, 30:40] = TYPE_S
    if thermal:
        flags[:, :, 0] |= TYPE_T
        flags[-1] |= TYPE_T
    T = (1.0 + 0.01 * rng.standard_normal(shape)).astype(np.float32) if thermal else None
    state = make_initial_state(shape, config=cfg, rho=rho, u=u, flags=flags, T=T)
    forcing = build_forcing(
        shape,
        nudge=NudgeSpec(n_cells=3, inv_tau=0.02, downstream_face=1),
        sponge=SpongeSpec(n_cells=3, inv_tau=0.05),
    )
    dyn = DynParams(force=jnp.array([1e-5, 0.0, -2e-5]),
                    omega_coriolis=jnp.array([1e-5, 2e-5, 3e-5]))

    ref_step = jax.jit(ref_step_f(cfg, forcing))
    r = state
    for _ in range(5):
        r = ref_step(r, dyn)

    run, impl = make_runner(cfg, forcing, shape=shape, n_inner=5,
                            impl="pallas-permuted", donate=False)
    assert impl == "pallas-permuted"
    p = run(state, dyn, 0)

    np.testing.assert_allclose(np.asarray(p.fi), np.asarray(r.fi), atol=6e-6)
    from latticeurbanwind_tpu.lbm.fields import update_fields

    fp_ = update_fields(p, cfg, dyn)
    fr = update_fields(r, cfg, dyn)
    np.testing.assert_allclose(np.asarray(fp_.rho), np.asarray(fr.rho), atol=4e-5)
    np.testing.assert_allclose(np.asarray(fp_.u), np.asarray(fr.u), atol=4e-5)
    if thermal:
        np.testing.assert_allclose(np.asarray(fp_.T), np.asarray(fr.T), atol=4e-5)

"""Fused moments+Welford kernel vs update_fields + welford_update."""

import dataclasses

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("LUW_PALLAS_INTERPRET", "1")


def _case(storage="f32", wall=False, sides=False, shape=(8, 24, 32),
          seed=4):
    import jax.numpy as jnp

    from latticeurbanwind_tpu.lbm import (
        DynParams, StepConfig, TYPE_E, TYPE_S, make_initial_state,
        omega_from_nu,
    )

    Z, Y, X = shape
    rng = np.random.default_rng(seed)
    cfg = StepConfig(omega=omega_from_nu(0.03), subgrid=True,
                     storage=storage, volume_force=True)
    if wall:
        cfg = dataclasses.replace(cfg, wall_model=True, wall_cd=0.0134)
    if sides:
        cfg = dataclasses.replace(cfg, wall_model=True, wall_cd=0.0134,
                                  wall_sides=True, wall_cd_sides=0.004)
    u = 0.03 * rng.standard_normal((3, Z, Y, X)).astype(np.float32)
    rho = (1.0 + 0.001 * rng.standard_normal(shape)).astype(np.float32)
    flags = np.zeros(shape, np.uint8)
    flags[-1] = TYPE_E
    flags[:, 0, :] |= TYPE_E
    flags[:, -1, :] |= TYPE_E
    flags[:, :, 0] |= TYPE_E
    flags[:, :, -1] |= TYPE_E
    flags[0] = TYPE_S
    flags[2:4, 8:14, 10:16] = TYPE_S
    state = make_initial_state(shape, config=cfg, rho=rho, u=u, flags=flags)
    dyn = DynParams(force=jnp.array([1e-5, 0.0, -2e-5]),
                    omega_coriolis=jnp.array([0.0, 1e-5, 2e-5]))
    return cfg, state, dyn, flags


@pytest.mark.parametrize("storage,wall,sides", [
    ("f32", False, False),
    ("f32", True, False),
    ("f32", True, True),
    ("bf16", True, False),
])
def test_fused_avg_matches_update_fields_plus_welford(storage, wall, sides):
    import jax.numpy as jnp

    from latticeurbanwind_tpu.lbm.fields import update_fields
    from latticeurbanwind_tpu.ops.avg_kernel import make_avg_update
    from latticeurbanwind_tpu.run.welford import init_avg, welford_update

    # three DISTINCT states so the m2 (variance) path is exercised
    states = []
    for seed in (4, 11, 23):
        cfg, state, dyn, flags = _case(storage, wall, sides, seed=seed)
        states.append(state)
    shape = states[0].rho.shape

    # reference pipeline: each sample through the jnp pair
    avg_ref = init_avg(shape, False)
    for st in states:
        avg_ref = welford_update(avg_ref, update_fields(st, cfg, dyn))

    fused = make_avg_update(cfg, shape)
    avg = init_avg(shape, False)
    for k, st in enumerate(states):
        avg = fused(st, avg, dyn, 1.0 / (k + 1))

    from latticeurbanwind_tpu.lbm.state import TYPE_S

    fluid = (flags & TYPE_S) == 0
    assert int(np.asarray(avg.count)) == 3
    tol = 1e-5 if storage == "f32" else 2e-3
    np.testing.assert_allclose(
        np.asarray(avg.mean_u)[:, fluid],
        np.asarray(avg_ref.mean_u)[:, fluid], atol=tol)
    np.testing.assert_allclose(
        np.asarray(avg.mean_rho)[fluid],
        np.asarray(avg_ref.mean_rho)[fluid], atol=tol)
    np.testing.assert_allclose(
        np.asarray(avg.m2_u)[fluid],
        np.asarray(avg_ref.m2_u)[fluid], atol=tol)


@pytest.mark.parametrize("storage,wall,sides", [
    ("f32", True, True),
    ("bf16", True, False),
])
def test_fused_avg_tiled_matches_untiled(storage, wall, sides, monkeypatch):
    """Forcing the plane budget below Y*X y-tiles the kernel (halo-row
    strip operands + _rollt); the tiled pass must agree with the jnp pair
    exactly like the untiled one — including across tile seams (the solid
    block in _case straddles rows 8:14 while T=32 splits Y=64 at row 32,
    so EQ-BC faces + periodic wrap cross seams; the mirrors are exercised
    by wall/sides)."""
    from latticeurbanwind_tpu.lbm.fields import update_fields
    from latticeurbanwind_tpu.ops import avg_kernel
    from latticeurbanwind_tpu.ops.avg_kernel import (
        _avg_tile, make_avg_update,
    )
    from latticeurbanwind_tpu.run.welford import init_avg, welford_update

    monkeypatch.setenv("LUW_AVG_PLANE_BUDGET", "1024")
    shape = (6, 64, 32)
    assert _avg_tile(64, 32) == 32      # 2 tiles

    states = []
    for seed in (4, 11):
        cfg, state, dyn, flags = _case(storage, wall, sides, shape=shape,
                                       seed=seed)
        states.append(state)

    avg_ref = init_avg(shape, False)
    for st in states:
        avg_ref = welford_update(avg_ref, update_fields(st, cfg, dyn))

    fused = make_avg_update(cfg, shape)
    avg = init_avg(shape, False)
    for k, st in enumerate(states):
        avg = fused(st, avg, dyn, 1.0 / (k + 1))

    from latticeurbanwind_tpu.lbm.state import TYPE_S

    fluid = (flags & TYPE_S) == 0
    tol = 1e-5 if storage == "f32" else 2e-3
    np.testing.assert_allclose(np.asarray(avg.mean_u)[:, fluid],
                               np.asarray(avg_ref.mean_u)[:, fluid], atol=tol)
    np.testing.assert_allclose(np.asarray(avg.mean_rho)[fluid],
                               np.asarray(avg_ref.mean_rho)[fluid], atol=tol)
    np.testing.assert_allclose(np.asarray(avg.m2_u)[fluid],
                               np.asarray(avg_ref.m2_u)[fluid], atol=tol)


def test_avg_kernel_support_gate():
    from latticeurbanwind_tpu.lbm import StepConfig
    from latticeurbanwind_tpu.ops.avg_kernel import avg_kernel_supported

    cfg = StepConfig(omega=1.0)
    assert avg_kernel_supported((157, 672, 674), cfg)   # CaseE 3m plane
    # above the untiled budget but y-tiles (1024 = 32*32): supported
    assert avg_kernel_supported((8, 1024, 1024), cfg)
    assert avg_kernel_supported((6, 4096, 3906), cfg)   # pod-local plane
    # no multiple-of-32 divisor of Y brings a tile under budget
    assert not avg_kernel_supported((8, 1021, 1024), cfg)
    assert not avg_kernel_supported(
        (8, 32, 32), StepConfig(omega=1.0, thermal=True, omega_t=1.1))


def test_driver_uses_fused_avg_and_matches_jnp_pair(tmp_path, monkeypatch):
    """run_case on the pallas tier routes averaging-only events through the
    fused kernel; the resulting accumulators match a run with the fused
    path disabled (the update_fields + welford_update pair) at fluid
    cells."""
    import jax.numpy as jnp

    from latticeurbanwind_tpu.lbm import (
        DynParams, Forcing, StepConfig, TYPE_E, TYPE_S, make_initial_state,
        omega_from_nu,
    )
    from latticeurbanwind_tpu.run.driver import (
        RunSettings, SolverCase, run_case,
    )
    from latticeurbanwind_tpu.units import Units

    shape = (8, 16, 128)
    rng = np.random.default_rng(9)

    def mk_case(parent):
        cfg = StepConfig(omega=omega_from_nu(0.04), subgrid=True,
                         storage="f32", volume_force=False)
        u = 0.02 * rng.standard_normal((3, *shape)).astype(np.float32)
        flags = np.zeros(shape, np.uint8)
        flags[0] = TYPE_S
        flags[-1] = TYPE_E
        st = make_initial_state(shape, config=cfg, u=u, flags=flags)
        un = Units()
        un.set_m_kg_s(1.0, 0.1, 1.0, 20.0, 8.0, 1.225)
        return SolverCase(
            config=cfg, forcing=Forcing(), state=st,
            dyn=DynParams(force=jnp.zeros(3), omega_coriolis=jnp.zeros(3)),
            units=un, cell_m=20.0, parent=parent, datetime="t",
            impl="pallas",
            settings=RunSettings(run_nstep=20, purge_avg=10,
                                 purge_avg_stride=2, chunk=5,
                                 snapshots=False))

    rng = np.random.default_rng(9)
    d1 = tmp_path / "fused"
    d1.mkdir()
    r_fused = run_case(mk_case(d1), quiet=True)

    import latticeurbanwind_tpu.ops.avg_kernel as ak

    monkeypatch.setattr(ak, "avg_kernel_supported", lambda *a: False)
    rng = np.random.default_rng(9)
    d2 = tmp_path / "pair"
    d2.mkdir()
    r_pair = run_case(mk_case(d2), quiet=True)

    fluid = np.ones(shape, bool)
    fluid[0] = False
    np.testing.assert_allclose(
        np.asarray(r_fused.avg.mean_u)[:, fluid],
        np.asarray(r_pair.avg.mean_u)[:, fluid], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(r_fused.avg.m2_u)[fluid],
        np.asarray(r_pair.avg.m2_u)[fluid], atol=1e-5)
    assert int(np.asarray(r_fused.avg.count)) == \
        int(np.asarray(r_pair.avg.count))

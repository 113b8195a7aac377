"""Sharded Pallas runner (shard_map + halo collective_permute) equivalence.

Runs the kernel in interpret mode over a 2-way z-sharded CPU mesh and checks
bit-level agreement with the single-device pallas step and the jnp tier.
"""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("LUW_PALLAS_INTERPRET", "1")


def test_sharded_pallas_matches_single():
    import jax
    import jax.numpy as jnp

    from latticeurbanwind_tpu.lbm import (
        DynParams, Forcing, StepConfig, TYPE_E, TYPE_S,
        make_initial_state, omega_from_nu,
    )
    from latticeurbanwind_tpu.ops.stream_collide import (
        make_pallas_step, merge_state, split_state,
    )
    from latticeurbanwind_tpu.parallel import domain_mesh, shard_state
    from latticeurbanwind_tpu.parallel.halo import make_sharded_pallas_runner

    shape = (8, 32, 128)
    rng = np.random.default_rng(0)
    cfg = StepConfig(omega=omega_from_nu(0.03), subgrid=True, storage="f32")
    u = 0.02 * rng.standard_normal((3, *shape)).astype(np.float32)
    flags = np.zeros(shape, np.uint8)
    flags[0] = TYPE_S
    flags[-1] = TYPE_E
    flags[3, 10:20, 40:60] = TYPE_S     # an obstacle crossing the shard cut
    flags[4, 10:20, 40:60] = TYPE_S
    state = make_initial_state(shape, config=cfg, u=u, flags=flags)
    dyn = DynParams(force=jnp.array([1e-5, 0.0, 0.0]),
                    omega_coriolis=jnp.array([0.0, 1e-5, 2e-5]))

    # single-device pallas ground truth
    pstep = make_pallas_step(cfg, Forcing(), shape)
    single = state
    step1 = jax.jit(lambda st, d: merge_state(pstep(split_state(st), d)))
    for _ in range(4):
        single = step1(single, dyn)

    mesh = domain_mesh((1, 1, 2))   # 2 z-shards
    run = make_sharded_pallas_runner(cfg, Forcing(), shape, mesh, n_inner=4)
    sharded = run(shard_state(state, mesh), dyn, 0)

    np.testing.assert_allclose(np.asarray(sharded.fi), np.asarray(single.fi),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sharded.u), np.asarray(single.u),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sharded.rho), np.asarray(single.rho),
                               atol=1e-6)


def test_sharded_pallas_with_forcing_matches_single():
    """Nudge + sponge forcing under z-sharding: per-shard sigma/face slices
    and the all-gathered global-top reference plane must reproduce the
    single-device pallas step."""
    import jax
    import jax.numpy as jnp

    from latticeurbanwind_tpu.lbm import (
        DynParams, NudgeSpec, SpongeSpec, StepConfig, TYPE_E, TYPE_S,
        build_forcing, make_initial_state, omega_from_nu,
    )
    from latticeurbanwind_tpu.ops.stream_collide import (
        make_pallas_step, merge_state, split_state,
    )
    from latticeurbanwind_tpu.parallel import domain_mesh, shard_state
    from latticeurbanwind_tpu.parallel.halo import make_sharded_pallas_runner

    shape = (8, 32, 128)
    rng = np.random.default_rng(1)
    cfg = StepConfig(omega=omega_from_nu(0.03), subgrid=True, storage="f32")
    u = 0.02 * rng.standard_normal((3, *shape)).astype(np.float32)
    flags = np.zeros(shape, np.uint8)
    flags[0] = TYPE_S
    flags[-1] = TYPE_E
    state = make_initial_state(shape, config=cfg, u=u, flags=flags)
    forcing = build_forcing(shape,
                            nudge=NudgeSpec(n_cells=3, inv_tau=0.02,
                                            downstream_face=1),
                            sponge=SpongeSpec(n_cells=3, inv_tau=0.05))
    dyn = DynParams(force=jnp.zeros(3), omega_coriolis=jnp.zeros(3))

    pstep = make_pallas_step(cfg, forcing, shape)
    step1 = jax.jit(lambda st, d: merge_state(pstep(split_state(st), d)))
    single = state
    for _ in range(4):
        single = step1(single, dyn)

    mesh = domain_mesh((1, 1, 2))
    run = make_sharded_pallas_runner(cfg, forcing, shape, mesh, n_inner=4)
    sharded = run(shard_state(state, mesh), dyn, 0)

    np.testing.assert_allclose(np.asarray(sharded.fi), np.asarray(single.fi),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sharded.u), np.asarray(single.u),
                               atol=1e-6)

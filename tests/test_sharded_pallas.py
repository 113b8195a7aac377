"""Sharded Pallas runner (shard_map + halo collective_permute) equivalence.

Runs the kernel in interpret mode over 2-8-way sharded CPU meshes — z plane
halos, y/x ghost layers, and their combinations — and checks agreement with
the single-device pallas step.  Also covers the VK synthetic-turbulence
inlet under z-sharding (the pre-step writes boundary equilibria per shard).
"""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("LUW_PALLAS_INTERPRET", "1")


def _case(shape=(8, 32, 128), with_forcing=False, seed=0):
    import jax.numpy as jnp

    from latticeurbanwind_tpu.lbm import (
        DynParams, Forcing, NudgeSpec, SpongeSpec, StepConfig, TYPE_E, TYPE_S,
        build_forcing, make_initial_state, omega_from_nu,
    )

    rng = np.random.default_rng(seed)
    cfg = StepConfig(omega=omega_from_nu(0.03), subgrid=True, storage="f32")
    u = 0.02 * rng.standard_normal((3, *shape)).astype(np.float32)
    flags = np.zeros(shape, np.uint8)
    flags[0] = TYPE_S
    flags[-1] = TYPE_E
    flags[:, 0, :] |= TYPE_E
    flags[:, -1, :] |= TYPE_E
    flags[:, :, 0] |= TYPE_E
    flags[:, :, -1] |= TYPE_E
    flags[0] = TYPE_S
    flags[3:5, 10:20, 40:60] = TYPE_S     # an obstacle crossing shard cuts
    state = make_initial_state(shape, config=cfg, u=u, flags=flags)
    if with_forcing:
        forcing = build_forcing(shape,
                                nudge=NudgeSpec(n_cells=3, inv_tau=0.02,
                                                downstream_face=1),
                                sponge=SpongeSpec(n_cells=3, inv_tau=0.05))
    else:
        forcing = Forcing()
    dyn = DynParams(force=jnp.array([1e-5, 0.0, 0.0]),
                    omega_coriolis=jnp.array([0.0, 1e-5, 2e-5]))
    return cfg, state, forcing, dyn


def _single(cfg, state, forcing, dyn, n_steps, pre_step=None):
    import jax

    from latticeurbanwind_tpu.ops.stream_collide import (
        make_pallas_step, merge_state, split_state,
    )

    has_forcing = (forcing.nudge_sigma is not None
                   or forcing.sponge_sigma_z is not None)
    vk_spec = getattr(pre_step, "kernel_spec", None)
    pstep = make_pallas_step(cfg, forcing, state.rho.shape, vk=vk_spec)

    def advance(st, d):
        s = split_state(st, with_fbc=has_forcing or vk_spec is not None)
        if pstep.uses_rows:            # y-tiled: seed the carried rows
            rl, rh = pstep.init_rows(s)
            s = s._replace(rows_lo=rl, rows_hi=rh)
        for t in range(n_steps):
            if pre_step is not None:   # pre-step (see lbm/stepper.py loop)
                s = pre_step(s, t)
            s = pstep(s, d)
        return merge_state(s)

    return jax.jit(advance)(state, dyn)


def _sharded(cfg, state, forcing, dyn, n_steps, split, pre_step=None):
    from latticeurbanwind_tpu.parallel import domain_mesh, shard_state
    from latticeurbanwind_tpu.parallel.halo import make_sharded_pallas_runner

    mesh = domain_mesh(split)
    run = make_sharded_pallas_runner(cfg, forcing, state.rho.shape, mesh,
                                     n_inner=n_steps, pre_step=pre_step,
                                     init_u=state.u, init_T=state.T)
    return run(shard_state(state, mesh), dyn, 0)


@pytest.mark.parametrize("split", [(1, 1, 2), (1, 2, 2), (2, 1, 1), (2, 2, 2)])
def test_sharded_matches_single(split):
    cfg, state, forcing, dyn = _case()
    single = _single(cfg, state, forcing, dyn, 4)
    sharded = _sharded(cfg, state, forcing, dyn, 4, split)
    np.testing.assert_allclose(np.asarray(sharded.fi), np.asarray(single.fi),
                               atol=1e-6)


@pytest.mark.parametrize("split", [(1, 1, 2), (2, 2, 1)])
def test_sharded_with_forcing_matches_single(split):
    """Nudge + sponge under sharding: per-shard sigma/face slices and the
    static FaceBC targets must reproduce the single-device pallas step."""
    from latticeurbanwind_tpu.lbm.fields import update_fields

    cfg, state, forcing, dyn = _case(with_forcing=True, seed=1)
    single = _single(cfg, state, forcing, dyn, 4)
    sharded = _sharded(cfg, state, forcing, dyn, 4, split)
    np.testing.assert_allclose(np.asarray(sharded.fi), np.asarray(single.fi),
                               atol=1e-6)
    fs = update_fields(sharded, cfg, dyn)
    f1 = update_fields(single, cfg, dyn)
    np.testing.assert_allclose(np.asarray(fs.u), np.asarray(f1.u), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fs.rho), np.asarray(f1.rho), atol=1e-6)


@pytest.mark.parametrize("split", [(1, 1, 2), (2, 2, 1), (2, 1, 2)])
def test_sharded_vk_inlet_matches_single(split):
    """The synthetic-turbulence inlet under ANY decomposition: the DDF
    pre-step slices its face slab writes to the shard's box and masks by
    face ownership (VERDICT r2 item 3 — production urban runs keep the fast
    tier with the inlet active under y/x splits too; reference analog
    setup.cpp:886-976 per-domain point buffers)."""
    from latticeurbanwind_tpu.bc.vk_inlet import (
        VkConfig, build_vk_runtime, make_vk_pre_step,
    )

    cfg, state, forcing, dyn = _case(with_forcing=True, seed=2)
    vk_cfg = VkConfig(enable=True, ti=0.08, L_lbm=6.0, nmodes=24, seed=7,
                      update_stride=2, stride_interpolation=True)
    rt = build_vk_runtime(vk_cfg, np.asarray(state.flags), np.asarray(state.u))
    assert rt is not None and len(rt.sigma) > 0
    pre = make_vk_pre_step(vk_cfg, rt, storage=cfg.storage)

    single = _single(cfg, state, forcing, dyn, 4, pre_step=pre.ddf)
    # pass the hook itself (NOT a wrapper): the runner reads its
    # .kernel_spec to compile the in-kernel inlet sites
    sharded = _sharded(cfg, state, forcing, dyn, 4, split, pre_step=pre.ddf)
    np.testing.assert_allclose(np.asarray(sharded.fi), np.asarray(single.fi),
                               atol=1e-6)


@pytest.mark.parametrize("split,shape", [
    ((1, 1, 2), (8, 64, 256)),    # z split: local plane 64x256 y-tiles (J=2)
    ((2, 2, 1), (6, 128, 256)),   # ghost split: y ghosts widen to 16 so the
                                  # tiled local Y stays 32-aligned (J=3)
])
def test_sharded_tiled_local_plane_matches_single(monkeypatch, split, shape):
    """Sharded runner composed with the y-TILED kernel: the LOCAL plane
    exceeds the (shrunken) VMEM budget, so each shard marches J > 1 y-tiles
    with packed neighbor rows — the configuration that lets billion-cell
    wide-flat slabs ride the fast tier multi-chip (VERDICT r2 item 1;
    reference contract: any local_N, lbm.cpp:1125)."""
    from latticeurbanwind_tpu.ops import stream_collide as sc
    from latticeurbanwind_tpu.parallel.halo import ghost_widths, local_shape_for

    monkeypatch.setattr(sc, "PLANE_BUDGET", 8192)
    monkeypatch.setattr(sc, "THERMAL_BUDGET_FRACTION", 1.0)
    monkeypatch.setattr(sc, "HEAVY_BUDGET_FRACTION", 1.0)
    local = local_shape_for(shape, split)
    assert local[1] * local[2] > 8192   # the old gate would have refused this
    assert sc.tile_plan(local[1], local[2]) not in (None, local[1])
    if split[1] > 1:
        assert ghost_widths(shape, split)[0] == 16
    cfg, state, forcing, dyn = _case(shape=shape, with_forcing=True, seed=4)
    single = _single(cfg, state, forcing, dyn, 3)
    sharded = _sharded(cfg, state, forcing, dyn, 3, split)
    np.testing.assert_allclose(np.asarray(sharded.fi), np.asarray(single.fi),
                               atol=1e-6)


def test_sharded_thermal_forcing_matches_single():
    """Thermal sub-lattice + nudge/sponge under a (1,2,2) ghost split —
    gp/gm halos, thermal T targets, and ghost-padded g arrays all in play."""
    import jax.numpy as jnp

    from latticeurbanwind_tpu.lbm import (
        DynParams, NudgeSpec, SpongeSpec, StepConfig, TYPE_E, TYPE_S, TYPE_T,
        build_forcing, make_initial_state, omega_from_nu,
    )

    shape = (8, 32, 64)
    rng = np.random.default_rng(3)
    cfg = StepConfig(omega=omega_from_nu(0.03), subgrid=True, thermal=True,
                     omega_t=1.1, beta=0.002, storage="f32")
    u = 0.02 * rng.standard_normal((3, *shape)).astype(np.float32)
    flags = np.zeros(shape, np.uint8)
    flags[-1] = TYPE_E
    flags[:, 0, :] |= TYPE_E
    flags[:, -1, :] |= TYPE_E
    flags[:, :, 0] |= TYPE_E
    flags[:, :, -1] |= TYPE_E
    flags[0] = TYPE_S
    flags[3:5, 10:20, 30:40] = TYPE_S
    flags[:, :, 0] |= TYPE_T
    flags[-1] |= TYPE_T
    T = (1.0 + 0.01 * rng.standard_normal(shape)).astype(np.float32)
    state = make_initial_state(shape, config=cfg, u=u, flags=flags, T=T)
    forcing = build_forcing(shape,
                            nudge=NudgeSpec(n_cells=3, inv_tau=0.02,
                                            downstream_face=1),
                            sponge=SpongeSpec(n_cells=3, inv_tau=0.05))
    dyn = DynParams(force=jnp.array([1e-5, 0.0, -2e-5]),
                    omega_coriolis=jnp.zeros(3))
    single = _single(cfg, state, forcing, dyn, 3)
    sharded = _sharded(cfg, state, forcing, dyn, 3, (1, 2, 2))
    np.testing.assert_allclose(np.asarray(sharded.fi), np.asarray(single.fi),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sharded.gi), np.asarray(single.gi),
                               atol=1e-6)


def test_sharded_volume_force_off_matches_single():
    """The sharded runner with volume_force=False (the bench --mesh
    configuration after the static VOLUME_FORCE specialization) must agree
    with the single-device specialized kernel under an inert dyn."""
    import dataclasses

    import jax.numpy as jnp

    from latticeurbanwind_tpu.lbm import DynParams

    cfg, state, forcing, _ = _case()
    cfg = dataclasses.replace(cfg, volume_force=False)
    dyn = DynParams(force=jnp.zeros(3), omega_coriolis=jnp.zeros(3))
    single = _single(cfg, state, forcing, dyn, 4)
    sharded = _sharded(cfg, state, forcing, dyn, 4, (1, 2, 2))
    np.testing.assert_allclose(np.asarray(sharded.fi), np.asarray(single.fi),
                               atol=1e-6)


@pytest.mark.parametrize("split", [(2, 1, 1), (1, 2, 2), (2, 2, 1)])
def test_sharded_wall_model_matches_single(split):
    """Wall model under sharding: the specular reflection's own-plane mirror
    reads and the Schumann mask (flags @ z-1) must compose with z plane
    halos and y/x ghost layers."""
    import dataclasses

    cfg, state, forcing, dyn = _case(seed=3)
    cfg = dataclasses.replace(cfg, wall_model=True, wall_cd=0.0134)
    single = _single(cfg, state, forcing, dyn, 4)
    sharded = _sharded(cfg, state, forcing, dyn, 4, split)
    np.testing.assert_allclose(np.asarray(sharded.fi), np.asarray(single.fi),
                               atol=1e-6)


@pytest.mark.parametrize("split", [(2, 1, 1), (1, 2, 2), (2, 2, 1)])
def test_sharded_wall_sides_matches_single(split):
    """Vertical-face wall model under sharding: the x/y specular mirrors
    pull through the same +-1 in-plane shifts the diagonal streaming
    already uses, so one ghost layer must suffice on every split."""
    import dataclasses

    cfg, state, forcing, dyn = _case(seed=5)
    cfg = dataclasses.replace(cfg, wall_model=True, wall_cd=0.0134,
                              wall_sides=True, wall_cd_sides=0.004)
    single = _single(cfg, state, forcing, dyn, 4)
    sharded = _sharded(cfg, state, forcing, dyn, 4, split)
    np.testing.assert_allclose(np.asarray(sharded.fi), np.asarray(single.fi),
                               atol=1e-6)

"""Pallas stream-collide kernel vs reference tier (interpret mode on CPU).

The performance tier must reproduce the reference tier to fp32 rounding with
every feature enabled: LES, equilibrium boundaries, bounce-back obstacles,
Coriolis, buffer nudging, top sponge, thermal sub-lattice, buoyancy.

v2 contract: the pallas tier steps pure DDFs (rho/u/T stay stale); nudge and
sponge targets are the static boundary values — exact whenever the nudge
reference faces are TYPE_E, which every LUW case guarantees (the boundary
shell is marked TYPE_E, run/standard.py / run/modes.py).  The fixtures
therefore mark the full outer shell TYPE_E, and field comparisons go through
lbm.fields.update_fields applied to both tiers' DDFs.
"""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("LUW_PALLAS_INTERPRET", "1")


def _mk_case(thermal, shape=(8, 32, 128), storage="f32"):
    import jax.numpy as jnp

    from latticeurbanwind_tpu.lbm import (
        DynParams, NudgeSpec, SpongeSpec, StepConfig, TYPE_E, TYPE_S, TYPE_T,
        build_forcing, make_initial_state, omega_from_nu,
    )

    Z, Y, X = shape
    rng = np.random.default_rng(0)
    cfg = StepConfig(omega=omega_from_nu(0.03), subgrid=True, thermal=thermal,
                     omega_t=1.1, beta=0.002, storage=storage)
    u = 0.02 * rng.standard_normal((3, Z, Y, X)).astype(np.float32)
    rho = (1.0 + 0.001 * rng.standard_normal(shape)).astype(np.float32)
    flags = np.zeros(shape, np.uint8)
    # LUW shell contract: ground solid, all other outer faces TYPE_E
    flags[-1] = TYPE_E
    flags[:, 0, :] |= TYPE_E
    flags[:, -1, :] |= TYPE_E
    flags[:, :, 0] |= TYPE_E
    flags[:, :, -1] |= TYPE_E
    flags[0] = TYPE_S
    flags[2, 10:20, 40:44] = TYPE_S
    flags[1:3, 5:9, 20:30] = TYPE_S
    if thermal:
        flags[:, :, 0] |= TYPE_T
        flags[-1] |= TYPE_T
    T = (1.0 + 0.01 * rng.standard_normal(shape)).astype(np.float32) if thermal else None
    state = make_initial_state(shape, config=cfg, rho=rho, u=u, flags=flags, T=T)
    forcing = build_forcing(shape,
                            nudge=NudgeSpec(n_cells=3, inv_tau=0.02, downstream_face=2),
                            sponge=SpongeSpec(n_cells=3, inv_tau=0.05))
    dyn = DynParams(force=jnp.array([1e-5, 0.0, -2e-5]),
                    omega_coriolis=jnp.array([0.0, 1e-5, 2e-5]))
    return cfg, state, forcing, dyn


@pytest.mark.parametrize("thermal", [False, True])
@pytest.mark.parametrize("shape", [(8, 32, 128), (7, 21, 45)])
def test_pallas_matches_reference(thermal, shape):
    _check_pallas_matches_reference(thermal, shape, "f32", atol=6e-6)


def test_pallas_f16_software_codec_matches_reference():
    """f16 DDFs ride the pallas tier via the in-kernel software FP16S codec
    (uint16 bit patterns, RN encode).  Must match the jnp tier's IEEE-f16
    codec to a few ULPs of the stored half — the two tiers' fp32 evaluation
    orders differ by ~1e-7, which can land on opposite sides of an RN
    rounding boundary (subnormal halves additionally flush below 2^-29)."""
    _check_pallas_matches_reference(False, (8, 32, 128), "f16", atol=2e-5)


def test_pallas_fp16c_codec_matches_reference():
    """FP16C (the reference's default 1-4-11 DDF format) through the
    in-kernel software codec vs the jnp tier's vectorized codec."""
    _check_pallas_matches_reference(False, (8, 32, 128), "fp16c", atol=2e-5)
    _check_pallas_matches_reference(True, (8, 32, 128), "fp16c", atol=2e-5)


def test_pallas_bf16_matches_reference():
    _check_pallas_matches_reference(False, (8, 32, 128), "bf16", atol=2e-4)


def test_pallas_volume_force_off_matches_reference():
    """volume_force=False compiles the Guo path out (reference VOLUME_FORCE
    off build, defines.hpp).  With an inert dyn the jnp tier's forcing terms
    are exactly zero, so the specialized kernel must still match it."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from latticeurbanwind_tpu.lbm import DynParams, build_forcing
    from latticeurbanwind_tpu.lbm.reference import make_step as ref_step_f
    from latticeurbanwind_tpu.lbm.state import decode_ddf
    from latticeurbanwind_tpu.ops.stream_collide import (
        make_pallas_step, merge_state, split_state,
    )

    cfg, state, _, _ = _mk_case(False, shape=(8, 32, 128))
    cfg = dataclasses.replace(cfg, volume_force=False)
    forcing = build_forcing(state.rho.shape)          # no nudge/sponge
    dyn = DynParams(force=jnp.zeros(3), omega_coriolis=jnp.zeros(3))
    ref_step = jax.jit(ref_step_f(cfg, forcing))
    pstep = make_pallas_step(cfg, forcing, state.rho.shape)

    def pal_run(st, d):
        s = split_state(st, with_fbc=False)
        for _ in range(5):
            s = pstep(s, d)
        return merge_state(s)

    r = state
    for _ in range(5):
        r = ref_step(r, dyn)
    p = jax.jit(pal_run)(state, dyn)
    np.testing.assert_allclose(np.asarray(decode_ddf(p.fi, "f32")),
                               np.asarray(decode_ddf(r.fi, "f32")), atol=6e-6)
    # the guard refuses inconsistent builds
    forcing_on = build_forcing(
        state.rho.shape,
        nudge=__import__("latticeurbanwind_tpu.lbm", fromlist=["NudgeSpec"])
        .NudgeSpec(n_cells=3, inv_tau=0.02, downstream_face=2))
    with pytest.raises(ValueError):
        make_pallas_step(cfg, forcing_on, state.rho.shape)


@pytest.mark.parametrize("thermal", [False, True])
@pytest.mark.parametrize("shape,storage", [
    ((8, 64, 128), "f32"),     # By=32, J=2 under the shrunken budget
    ((7, 96, 45), "f32"),      # J=3, unaligned X
    ((8, 64, 128), "fp16c"),   # rows ride the bit codec
])
def test_pallas_tiled_matches_reference(monkeypatch, thermal, shape, storage):
    """y-tiled kernel (J > 1): cross-tile streaming through the packed
    neighbor-row slabs must be exact.  The VMEM plane budget is shrunk so
    tiling engages on CI-sized grids; production engages it when Y*X exceeds
    the real budget (tile_plan)."""
    from latticeurbanwind_tpu.ops import stream_collide as sc

    monkeypatch.setattr(sc, "PLANE_BUDGET", 4096)
    monkeypatch.setattr(sc, "THERMAL_BUDGET_FRACTION", 1.0)
    monkeypatch.setattr(sc, "HEAVY_BUDGET_FRACTION", 1.0)
    assert sc.tile_plan(shape[1], shape[2]) not in (None, shape[1])
    atol = 6e-6 if storage == "f32" else 2e-5
    _check_pallas_matches_reference(thermal, shape, storage, atol=atol)


@pytest.mark.parametrize("tiled", [False, True])
def test_pallas_wall_model_matches_reference(monkeypatch, tiled):
    """Specular ground streaming + Schumann wall stress (StepConfig.
    wall_model): both tiers must agree, including across y-tile seams
    (the specular source is the OWN-plane mirror fm row)."""
    if tiled:
        from latticeurbanwind_tpu.ops import stream_collide as sc

        monkeypatch.setattr(sc, "PLANE_BUDGET", 4096)
        monkeypatch.setattr(sc, "HEAVY_BUDGET_FRACTION", 1.0)
        shape = (8, 64, 128)
    else:
        shape = (8, 32, 128)
    # slightly looser than the vanilla 6e-6: the near-wall |u_h| u_h force
    # reorders fp32 accumulation in the moment sums
    _check_pallas_matches_reference(False, shape, "f32", atol=1e-5,
                                    wall_model=True)


@pytest.mark.parametrize("tiled", [False, True])
def test_pallas_wall_sides_matches_reference(monkeypatch, tiled):
    """Vertical-face wall model (StepConfig.wall_sides): specular x/y
    mirrors + tangential Schumann stress must agree between tiers,
    including across y-tile seams (the y-mirror's spec source crosses the
    tile boundary through the carried rows)."""
    if tiled:
        from latticeurbanwind_tpu.ops import stream_collide as sc

        monkeypatch.setattr(sc, "PLANE_BUDGET", 4096)
        monkeypatch.setattr(sc, "HEAVY_BUDGET_FRACTION", 1.0)
        shape = (8, 64, 128)
    else:
        shape = (8, 32, 128)
    _check_pallas_matches_reference(False, shape, "f32", atol=1e-5,
                                    wall_model=True, wall_sides=True)


def _check_pallas_matches_reference(thermal, shape, storage, atol,
                                    wall_model=False, wall_sides=False):
    import jax

    from latticeurbanwind_tpu.lbm.fields import update_fields
    from latticeurbanwind_tpu.lbm.reference import make_step as ref_step_f
    from latticeurbanwind_tpu.lbm.state import decode_ddf
    from latticeurbanwind_tpu.ops.stream_collide import (
        make_pallas_step, merge_state, split_state,
    )

    cfg, state, forcing, dyn = _mk_case(thermal, shape=shape, storage=storage)
    if wall_model:
        import dataclasses

        cfg = dataclasses.replace(cfg, wall_model=True, wall_cd=0.0134)
    if wall_sides:
        import dataclasses

        cfg = dataclasses.replace(cfg, wall_sides=True, wall_cd_sides=0.004)
    ref_step = jax.jit(ref_step_f(cfg, forcing))
    pstep = make_pallas_step(cfg, forcing, state.rho.shape)

    def pal_run(st, d):
        s = split_state(st, with_fbc=True)
        if pstep.uses_rows:     # y-tiled: seed once, then the kernel's own
            rl, rh = pstep.init_rows(s)   # row outputs carry across steps
            s = s._replace(rows_lo=rl, rows_hi=rh)
        for _ in range(5):
            s = pstep(s, d)
        return merge_state(s)

    r = state
    for _ in range(5):
        r = ref_step(r, dyn)
    p = jax.jit(pal_run)(state, dyn)
    np.testing.assert_allclose(np.asarray(decode_ddf(p.fi, storage)),
                               np.asarray(decode_ddf(r.fi, storage)),
                               atol=atol)
    if thermal:
        np.testing.assert_allclose(np.asarray(decode_ddf(p.gi, storage)),
                                   np.asarray(decode_ddf(r.gi, storage)),
                                   atol=atol)
    # field comparison through the shared update_fields pass (the pallas
    # tier's rho/u/T are stale by design)
    fr = update_fields(r, cfg, dyn)
    fp_ = update_fields(p, cfg, dyn)
    np.testing.assert_allclose(np.asarray(fp_.rho), np.asarray(fr.rho), atol=4 * atol)
    np.testing.assert_allclose(np.asarray(fp_.u), np.asarray(fr.u), atol=4 * atol)
    if thermal:
        np.testing.assert_allclose(np.asarray(fp_.T), np.asarray(fr.T), atol=4 * atol)


def test_update_fields_reports_prescribed_boundaries():
    """TYPE_E cells' moments must reproduce their prescribed rho/u exactly;
    solid cells keep prior values."""
    from latticeurbanwind_tpu.lbm import TYPE_E, TYPE_S
    from latticeurbanwind_tpu.lbm.fields import update_fields

    cfg, state, forcing, dyn = _mk_case(False)
    out = update_fields(state, cfg, dyn)
    flags = np.asarray(state.flags)
    eqbc = (flags & TYPE_E) != 0
    solid = (flags & TYPE_S) != 0
    np.testing.assert_allclose(np.asarray(out.u)[:, eqbc],
                               np.asarray(state.u)[:, eqbc], atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.rho)[eqbc],
                               np.asarray(state.rho)[eqbc], atol=2e-6)
    np.testing.assert_array_equal(np.asarray(out.u)[:, solid],
                                  np.asarray(state.u)[:, solid])


def test_split_merge_round_trip():
    from latticeurbanwind_tpu.ops.stream_collide import merge_state, split_state

    cfg, state, _, _ = _mk_case(thermal=True)
    back = merge_state(split_state(state))
    np.testing.assert_array_equal(np.asarray(back.fi), np.asarray(state.fi))
    np.testing.assert_array_equal(np.asarray(back.gi), np.asarray(state.gi))


def test_pallas_support_gate():
    from latticeurbanwind_tpu.lbm import StepConfig
    from latticeurbanwind_tpu.ops.stream_collide import pallas_supported

    from latticeurbanwind_tpu.ops.stream_collide import PLANE_BUDGET, tile_plan

    cfg = StepConfig(omega=1.0)
    assert pallas_supported((8, 32, 128), cfg)
    # unaligned planes legalize as full-dim blocks (verified on v5e)
    assert pallas_supported((10, 44, 45), cfg)
    assert pallas_supported((31, 250, 333), cfg)
    assert not pallas_supported((2, 32, 128), cfg)     # too few planes
    assert not pallas_supported((8, 4, 128), cfg)      # degenerate plane
    # planes beyond the VMEM budget y-tile (reference contract: any local
    # size, kernel.cpp:1486) — (1024, 1024) tiles at By=256
    assert pallas_supported((8, 1024, 1024), cfg)
    assert tile_plan(1024, 1024) == 256
    # the SCALING.md billion-cell slab: 4096 x 3906 plane tiles at By=64
    assert tile_plan(4096, 3906) == 64
    assert pallas_supported((63, 4096, 3906), cfg)
    # no 32-multiple divisor of Y -> unsupported (falls back to jnp tier)
    assert tile_plan(1026, 1024) is None
    assert not pallas_supported((8, 1026, 1024), cfg)
    # untiled planes keep By = Y
    assert tile_plan(250, 333) == 250
    assert PLANE_BUDGET == 262144


def test_fast_tier_fallback_warns(monkeypatch):
    """A valid deck shape that falls off the fast tier must explain itself:
    the stepper emits one RuntimeWarning naming the failed constraint and
    the expected slowdown instead of silently dispatching the jnp tier."""
    import warnings

    import jax as _jax

    from latticeurbanwind_tpu.lbm import StepConfig
    from latticeurbanwind_tpu.lbm.stepper import _pallas_ok
    from latticeurbanwind_tpu.ops.stream_collide import pallas_reject_reason

    cfg = StepConfig(omega=1.0)
    # reasons name the actual constraint
    assert "no legal y-tiling" in pallas_reject_reason((8, 1026, 1024), cfg)
    assert "Z=2" in pallas_reject_reason((2, 32, 128), cfg)
    assert pallas_reject_reason((8, 32, 128), cfg) is None

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert not _pallas_ok((8, 1026, 1024), cfg)
    msgs = [str(w.message) for w in rec if w.category is RuntimeWarning]
    assert any("jnp reference tier" in m and "no legal y-tiling" in m
               for m in msgs), msgs
    # supported shapes warn nothing
    with warnings.catch_warnings(record=True) as rec2:
        warnings.simplefilter("always")
        assert _pallas_ok((8, 32, 128), cfg)
    assert not [w for w in rec2 if w.category is RuntimeWarning]

def test_pallas_block_specs_are_mosaic_legal(monkeypatch):
    """Audit every BlockSpec against Mosaic's block-mapping rule (last two
    block dims divisible by (8, 128) or equal to the array dims).  Interpret
    mode skips that check, so an illegal spec passes CI yet explodes on real
    hardware at lowering time — exactly how the 3 m Case E grid (Y=672,
    By=224, faces + VK lane masks blocked on the lane dim) got through.
    Captures the specs and the runtime arg shapes off a live call, with the
    budget shrunk so tiling engages at a By that is NOT a 128 multiple."""
    import jax
    import jax.numpy as jnp

    from latticeurbanwind_tpu.lbm import DynParams
    from latticeurbanwind_tpu.ops import stream_collide as sc

    monkeypatch.setattr(sc, "PLANE_BUDGET", 4096)
    monkeypatch.setattr(sc, "HEAVY_BUDGET_FRACTION", 1.0)
    shape = (8, 96, 128)
    assert sc.tile_plan(*shape[1:]) == 32       # 32 % 128 != 0: the hard case

    captured = {}
    real_call = sc.pl.pallas_call

    def spy(kernel, **kw):
        inner = real_call(kernel, **kw)

        def wrapped(*args):
            captured["in"] = list(zip(kw["in_specs"], [a.shape for a in args]))
            captured["out"] = list(zip(kw["out_specs"],
                                       [s.shape for s in kw["out_shape"]]))
            return inner(*args)

        return wrapped

    monkeypatch.setattr(sc.pl, "pallas_call", spy)

    cfg, state, forcing, dyn = _mk_case(False, shape=shape)
    # VK sites on all four side faces, like the Case E production deck
    rng = np.random.default_rng(3)
    Z, Y, X = shape
    vk = {"sites": (("lane0", "uw"), ("laneL", "ue"),
                    ("row0", "us"), ("rowL", "un")),
          "masks": {
              "uw": jnp.asarray((rng.random((Z, 1, Y)) < .5).astype(np.float32)),
              "ue": jnp.asarray((rng.random((Z, 1, Y)) < .5).astype(np.float32)),
              "us": jnp.asarray((rng.random((Z, 1, X)) < .5).astype(np.float32)),
              "un": jnp.asarray((rng.random((Z, 1, X)) < .5).astype(np.float32)),
          }}
    pstep = sc.make_pallas_step(cfg, forcing, shape, vk=vk)
    s = sc.split_state(state, with_fbc=True)
    rl, rh = pstep.init_rows(s)
    s = s._replace(rows_lo=rl, rows_hi=rh)
    jax.block_until_ready(pstep(s, dyn).f0)

    assert captured, "pallas_call was not invoked"
    from jax.experimental.pallas import tpu as pltpu

    def legal(block, arr):
        for d, align in ((-1, 128), (-2, 8)):
            b = block[d]
            if b is None:   # unblocked dim: whole array
                continue
            if b != arr[d] and b % align != 0:
                return False
        return True

    for spec, arr_shape in captured["in"] + captured["out"]:
        if spec.memory_space == pltpu.SMEM:
            continue
        assert legal(spec.block_shape, arr_shape), (
            f"Mosaic-illegal block {spec.block_shape} for array {arr_shape}")

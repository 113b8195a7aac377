"""Fused moments + Welford averaging Pallas kernel.

The production profile-run spends half its wall clock in the averaging
phase: every sample event pays a full jnp `update_fields` pass (measured
~250 ms at the 71M-cell Case E grid — ~10x its bandwidth bound, the
XLA roll/select chains materialize every shifted temporary) plus a
separate `welford_update` pass.  This kernel fuses both into ONE streaming
pass that reads each DDF plane once and updates the Welford accumulators
in place:

  traffic/cell = 29 channel-planes (19 own + 5 from z-1 + 5 from z+1,
  storage width) + 3 flag planes + accumulator read/write (~40 B)
  ~= 100-160 B/cell, vs ~10x that for the jnp pair.

Moment semantics are identical to `lbm.fields.update_fields` (streamed
pre-collision moments, halfway bounce-back + the wall-model mirrors, Guo
half-step force correction with global force + Coriolis + wall stress,
TYPE_E cells reporting their frozen equilibria's moments) — except solid
cells, whose accumulators simply HOLD (update_fields re-accumulates the
stale state value there; both are cosmetic, solids are masked by `fluid`
in every product).  Equivalence at fluid/TYPE_E cells is pinned by
tests/test_avg_kernel.py against update_fields + welford_update.

The kernel runs one grid program per z plane with full (Y, X) blocks —
a moments pass has a small live set, so planes well beyond the STEP
kernel's tile budget fit VMEM untiled; `avg_kernel_supported` gates the
plane size and the driver falls back to the jnp pair above it.

Reference: update_fields kernel kernel.cpp:1938-2028 + the host-side
Welford accumulation it feeds (setup.cpp:4411-4494) — here both stay on
device and fuse.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from ..lbm.lattice import C19, CS, GROUP_M, GROUP_P, OPP19
from ..lbm.state import DynParams, LBMState, StepConfig, TYPE_E, TYPE_S
from ..run.welford import AvgState
from .stream_collide import _MIR_X, _MIR_Y, _make_codec, _roll2

# VMEM ceiling for the untiled full-plane pass: ~29 storage-width channel
# planes x2 (pipeline) + ~15 live f32 planes.  700k cells ~= 100 MB on the
# 128 MB v5e VMEM; clamp below that with margin.
AVG_PLANE_BUDGET = 600_000


def avg_kernel_supported(shape: Tuple[int, int, int],
                         config: StepConfig) -> bool:
    Z, Y, X = shape
    return (not config.thermal and Z >= 3 and Y >= 8 and X >= 8
            and Y * X <= AVG_PLANE_BUDGET)


def make_avg_update(config: StepConfig, shape: Tuple[int, int, int]):
    """Build `fused(state, avg, dyn, inv_n) -> AvgState` for a fixed grid.

    `inv_n` = 1/(n+1) as float32 (the caller advances the count).  The
    state passes through untouched (rho/u stay stale — the pure-DDF
    contract); only the accumulators update.
    """
    Z, Y, X = shape
    if not avg_kernel_supported(shape, config):
        raise NotImplementedError(f"avg kernel unsupported for {shape}")
    dec, _ = _make_codec(config.storage)
    wall = config.wall_model
    sides = config.wall_sides

    def kernel(dyn_ref, fi0_ref, fip_ref, fim_ref, flm_ref, fl0_ref,
               flp_ref, mu_ref, m2_ref, mr_ref, muo_ref, m2o_ref, mro_ref):
        fl0 = fl0_ref[0].astype(jnp.int32)
        solid_0 = ((fl0 & TYPE_S) != 0).astype(jnp.float32)
        eqbc = ((fl0 & TYPE_E) != 0).astype(jnp.float32)
        sol_m = ((flm_ref[0].astype(jnp.int32) & TYPE_S) != 0).astype(
            jnp.float32)
        sol_p = ((flp_ref[0].astype(jnp.int32) & TYPE_S) != 0).astype(
            jnp.float32)

        def solpl(cz):
            return (sol_m if cz == 1 else (sol_p if cz == -1 else solid_0))

        def chan(d, window_cz):
            """Decoded plane of channel d streamed from z - window_cz:
            cz=+1 channels pull from the z-1 window (fip operand carries
            fi[9:14] planes of z-1), cz=-1 from z+1 (fi[14:19])."""
            if window_cz == 1:
                return dec(fip_ref[d - GROUP_P.start, 0])
            if window_cz == -1:
                return dec(fim_ref[d - GROUP_M.start, 0])
            return dec(fi0_ref[d, 0])

        own = [chan(d, 0) for d in range(19)]

        rho_s = own[0]
        mom = [None, None, None]
        rho_o = own[0]
        mom_o = [None, None, None]
        for d in range(1, 19):
            cx, cy, cz = (int(v) for v in C19[d])
            src = _roll2(chan(d, cz), cy, cx)
            src_solid = _roll2(solpl(cz), cy, cx)
            repl = own[int(OPP19[d])]
            if sides and _MIR_Y[d] is not None:
                spec = _roll2(chan(_MIR_Y[d], cz), 0, cx)
                nbr = _roll2(solpl(cz), 0, cx)
                repl = repl * nbr + spec * (1.0 - nbr)
            if sides and _MIR_X[d] is not None:
                spec = _roll2(chan(_MIR_X[d], cz), cy, 0)
                nbr = _roll2(solpl(cz), cy, 0)
                repl = repl * nbr + spec * (1.0 - nbr)
            if wall and cz == 1:
                mir = next(m for m in range(GROUP_M.start, GROUP_M.stop)
                           if int(C19[m, 0]) == cx and int(C19[m, 1]) == cy)
                spec = _roll2(own[mir], cy, cx)
                nbr = _roll2(solid_0, cy, cx)
                repl = repl * nbr + spec * (1.0 - nbr)
            f_d = repl * src_solid + src * (1.0 - src_solid)
            rho_s = rho_s + f_d
            rho_o = rho_o + own[d]
            for a in range(3):
                c = int(C19[d, a])
                if c == 0:
                    continue
                t = f_d if c == 1 else -f_d
                to = own[d] if c == 1 else -own[d]
                mom[a] = t if mom[a] is None else mom[a] + t
                mom_o[a] = to if mom_o[a] is None else mom_o[a] + to

        rhon = rho_s + 1.0
        inv = 1.0 / rhon
        un = [m * inv for m in mom]

        fxg = dyn_ref[0, 1]
        fyg = dyn_ref[0, 2]
        fzg = dyn_ref[0, 3]
        ox = dyn_ref[0, 4]
        oy = dyn_ref[0, 5]
        oz = dyn_ref[0, 6]
        Fx = fxg - 2.0 * rhon * (oy * un[2] - oz * un[1])
        Fy = fyg - 2.0 * rhon * (oz * un[0] - ox * un[2])
        Fz = fzg - 2.0 * rhon * (ox * un[1] - oy * un[0])
        if wall:
            ga = (1.0 - solid_0) * sol_m
            uh = jnp.sqrt(un[0] * un[0] + un[1] * un[1])
            cw = config.wall_cd * ga * rhon * uh
            Fx = Fx - cw * un[0]
            Fy = Fy - cw * un[1]
        if sides and config.wall_cd_sides > 0.0:
            gxs = jnp.maximum(_roll2(solid_0, 0, 1), _roll2(solid_0, 0, -1))
            gys = jnp.maximum(_roll2(solid_0, 1, 0), _roll2(solid_0, -1, 0))
            fl_ = 1.0 - solid_0
            ut_x = jnp.sqrt(un[1] * un[1] + un[2] * un[2])
            ut_y = jnp.sqrt(un[0] * un[0] + un[2] * un[2])
            cwx = config.wall_cd_sides * fl_ * gxs * rhon * ut_x
            cwy = config.wall_cd_sides * fl_ * gys * rhon * ut_y
            Fx = Fx - cwy * un[0]
            Fy = Fy - cwx * un[1]
            Fz = Fz - (cwx + cwy) * un[2]
        half = 0.5 * inv
        u_f = [jnp.clip(un[0] + Fx * half, -CS, CS),
               jnp.clip(un[1] + Fy * half, -CS, CS),
               jnp.clip(un[2] + Fz * half, -CS, CS)]

        rho_own = rho_o + 1.0
        inv_o = 1.0 / rho_own
        keep = (1.0 - solid_0)           # solids: accumulators hold
        sel_eq = eqbc
        rho_rep = rho_own * sel_eq + rhon * (1.0 - sel_eq)
        u_rep = [mom_o[a] * inv_o * sel_eq + u_f[a] * (1.0 - sel_eq)
                 for a in range(3)]

        inv_n = dyn_ref[0, 0]
        m2 = m2_ref[0]
        m2_acc = None
        for a in range(3):
            mean_a = mu_ref[a, 0]
            delta = (u_rep[a] - mean_a) * keep
            mean_new = mean_a + delta * inv_n
            term = delta * (u_rep[a] - mean_new) * keep
            m2_acc = term if m2_acc is None else m2_acc + term
            muo_ref[a, 0] = mean_new
        m2o_ref[0] = m2 + m2_acc
        mr = mr_ref[0]
        mro_ref[0] = mr + (rho_rep - mr) * keep * inv_n

    grid = (Z,)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                  # dyn row
        pl.BlockSpec((19, 1, Y, X), lambda q: (0, q, 0, 0)),    # own planes
        pl.BlockSpec((5, 1, Y, X), lambda q: (0, (q + Z - 1) % Z, 0, 0)),
        pl.BlockSpec((5, 1, Y, X), lambda q: (0, (q + 1) % Z, 0, 0)),
        pl.BlockSpec((1, Y, X), lambda q: ((q + Z - 1) % Z, 0, 0)),  # flags z-1
        pl.BlockSpec((1, Y, X), lambda q: (q, 0, 0)),
        pl.BlockSpec((1, Y, X), lambda q: ((q + 1) % Z, 0, 0)),
        pl.BlockSpec((3, 1, Y, X), lambda q: (0, q, 0, 0)),     # mean_u
        pl.BlockSpec((1, Y, X), lambda q: (q, 0, 0)),           # m2
        pl.BlockSpec((1, Y, X), lambda q: (q, 0, 0)),           # mean_rho
    ]
    out_specs = [
        pl.BlockSpec((3, 1, Y, X), lambda q: (0, q, 0, 0)),
        pl.BlockSpec((1, Y, X), lambda q: (q, 0, 0)),
        pl.BlockSpec((1, Y, X), lambda q: (q, 0, 0)),
    ]

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((3, Z, Y, X), jnp.float32),
            jax.ShapeDtypeStruct((Z, Y, X), jnp.float32),
            jax.ShapeDtypeStruct((Z, Y, X), jnp.float32),
        ],
        # accumulators update in place (args: dyn,fi,fi,fi,fl,fl,fl,mu,m2,mr)
        input_output_aliases={7: 0, 8: 1, 9: 2},
        interpret=bool(os.environ.get("LUW_PALLAS_INTERPRET")),
    )

    @partial(jax.jit, donate_argnums=(1,))
    def fused(state: LBMState, avg: AvgState, dyn: DynParams,
              inv_n) -> AvgState:
        row = jnp.concatenate([
            jnp.asarray(inv_n, jnp.float32).reshape(1),
            dyn.force.astype(jnp.float32).reshape(3),
            dyn.omega_coriolis.astype(jnp.float32).reshape(3),
            jnp.zeros(1, jnp.float32),
        ]).reshape(1, 8)
        fi = state.fi
        if fi.dtype == jnp.float16:    # software codec operates on raw bits
            fi = jax.lax.bitcast_convert_type(fi, jnp.uint16)
        fp = fi[GROUP_P]               # the z-offset windows ride separate
        fm = fi[GROUP_M]               # operands (block starts must align)
        mu, m2, mr = call(row, fi, fp, fm, state.flags, state.flags,
                          state.flags, avg.mean_u, avg.m2_u, avg.mean_rho)
        return AvgState(count=avg.count + 1, mean_u=mu, m2_u=m2,
                        mean_rho=mr, mean_T=avg.mean_T)

    return fused

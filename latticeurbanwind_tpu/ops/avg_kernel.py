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

The kernel runs one grid program per (z plane, y tile): planes under
`AVG_PLANE_BUDGET` cells use one full (Y, X) block per z; larger planes
split into 32-multiple row tiles whose tile-crossing y rolls read halo
rows from 8-row strip operands (see `fam` below).  Any fast-tier grid is
covered (sizing pads Y to a multiple of 32); `avg_kernel_supported`
gates the rest and the driver falls back to the jnp pair.

Reference: update_fields kernel kernel.cpp:1938-2028 + the host-side
Welford accumulation it feeds (setup.cpp:4411-4494) — here both stay on
device and fuse.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from ..lbm.lattice import C19, CS, GROUP_M, GROUP_P, OPP19
from ..lbm.state import DynParams, LBMState, StepConfig, TYPE_E, TYPE_S
from ..run.welford import AvgState
from .stream_collide import _MIR_X, _MIR_Y, _make_codec, _roll2, _rollt

# VMEM ceiling per (tile, X) block, measured on the v5e: ~200 B/cell of
# double-buffered block windows (29 storage-width channel planes + flags
# + 2x5 f32 accumulator planes) + ~190 B/cell of scoped kernel stack
# (the live decoded-f32 set) ~= 390 B/cell against the 128 MB VMEM.
# 230k cells/block ~= 90 MB leaves pipelining margin (453k — the CaseE
# 3 m plane — measurably OOMs).  Planes above it y-tile: rows-per-tile
# must divide Y and be a multiple of 32 (uint8 flags sublane packing) —
# run/sizing.apply_fast_tier pads deck grids to Y % 32 == 0, so by=32
# always exists and any fast-tier grid is covered.
AVG_PLANE_BUDGET = 230_000


def _avg_tile(Y: int, X: int) -> Optional[int]:
    """Rows-per-tile for the fused averaging pass (None = unsupported)."""
    budget = int(os.environ.get("LUW_AVG_PLANE_BUDGET", 0)) or AVG_PLANE_BUDGET
    if Y * X <= budget:
        return Y
    best = None
    for by in range(32, Y, 32):
        if Y % by == 0 and by * X <= budget:
            best = by
    return best


def avg_kernel_supported(shape: Tuple[int, int, int],
                         config: StepConfig) -> bool:
    Z, Y, X = shape
    return (not config.thermal and Z >= 3 and Y >= 8 and X >= 8
            and _avg_tile(Y, X) is not None)


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
    T = _avg_tile(Y, X)
    tiled = T < Y   # NT > 1: halo rows ride 8-row strip operands

    def kernel(*refs):
        it = iter(refs)
        dyn_ref = next(it)

        def fam():
            """(tile_ref, below-strip, above-strip) for one plane family.
            Untiled kernels carry no strips (rolls wrap within the plane);
            tiled ones read 8-row strips whose last/first row are the
            plane rows just below/above the tile (Mosaic requires block
            sublane dims divisible by 8, so single-row blocks are out —
            the tile height is a multiple of 32, putting the wanted rows
            at fixed offsets 7 and 0 of 8-aligned strip blocks)."""
            if not tiled:
                return (next(it), None, None)
            return (next(it), next(it), next(it))

        fi0_f, fip_f, fim_f = fam(), fam(), fam()
        flm_f, fl0_f, flp_f = fam(), fam(), fam()
        mu_ref, m2_ref, mr_ref = next(it), next(it), next(it)
        muo_ref, m2o_ref, mro_ref = next(it), next(it), next(it)

        def smask(plane):
            return ((plane.astype(jnp.int32) & TYPE_S) != 0).astype(
                jnp.float32)

        def smask3(f):
            t_, lo_, hi_ = f
            if lo_ is None:
                return (smask(t_[0]), None, None)
            return (smask(t_[0]), smask(lo_[0][7:8, :]),
                    smask(hi_[0][0:1, :]))

        fl0 = fl0_f[0][0].astype(jnp.int32)
        solid_0 = smask3(fl0_f)
        eqbc = ((fl0 & TYPE_E) != 0).astype(jnp.float32)
        sol_m = smask3(flm_f)
        sol_p = smask3(flp_f)

        def solpl(cz):
            return (sol_m if cz == 1 else (sol_p if cz == -1 else solid_0))

        def chan(d, window_cz):
            """Decoded (tile, below-row, above-row) triple of channel d
            streamed from z - window_cz: cz=+1 channels pull from the z-1
            window (fip operands carry fi[9:14] of z-1), cz=-1 from z+1
            (fi[14:19]).  The strip rows feed tile-crossing y rolls."""
            if window_cz == 1:
                f, i = fip_f, d - GROUP_P.start
            elif window_cz == -1:
                f, i = fim_f, d - GROUP_M.start
            else:
                f, i = fi0_f, d
            t_ = dec(f[0][i, 0])
            if f[1] is None:
                return (t_, None, None)
            return (t_, dec(f[1][i, 0])[7:8, :], dec(f[2][i, 0])[0:1, :])

        def roll(triple, cy, cx):
            """result[y, x] = src[y-cy, x-cx]; rows entering from outside
            the tile come from the below/above strips (periodic across the
            whole plane by the strips' index maps); untiled planes wrap
            in place."""
            t_, lo_, hi_ = triple
            if lo_ is None:
                return _roll2(t_, cy, cx)
            return _rollt(t_, lo_, hi_, cy, cx)

        own = [chan(d, 0) for d in range(19)]

        rho_s = own[0][0]
        mom = [None, None, None]
        rho_o = own[0][0]
        mom_o = [None, None, None]
        for d in range(1, 19):
            cx, cy, cz = (int(v) for v in C19[d])
            src = roll(chan(d, cz), cy, cx)
            src_solid = roll(solpl(cz), cy, cx)
            repl = own[int(OPP19[d])][0]
            if sides and _MIR_Y[d] is not None:
                spec = roll(chan(_MIR_Y[d], cz), 0, cx)
                nbr = roll(solpl(cz), 0, cx)
                repl = repl * nbr + spec * (1.0 - nbr)
            if sides and _MIR_X[d] is not None:
                spec = roll(chan(_MIR_X[d], cz), cy, 0)
                nbr = roll(solpl(cz), cy, 0)
                repl = repl * nbr + spec * (1.0 - nbr)
            if wall and cz == 1:
                mir = next(m for m in range(GROUP_M.start, GROUP_M.stop)
                           if int(C19[m, 0]) == cx and int(C19[m, 1]) == cy)
                spec = roll(own[mir], cy, cx)
                nbr = roll(solid_0, cy, cx)
                repl = repl * nbr + spec * (1.0 - nbr)
            f_d = repl * src_solid + src * (1.0 - src_solid)
            rho_s = rho_s + f_d
            rho_o = rho_o + own[d][0]
            for a in range(3):
                c = int(C19[d, a])
                if c == 0:
                    continue
                t = f_d if c == 1 else -f_d
                to = own[d][0] if c == 1 else -own[d][0]
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
            ga = (1.0 - solid_0[0]) * sol_m[0]
            uh = jnp.sqrt(un[0] * un[0] + un[1] * un[1])
            cw = config.wall_cd * ga * rhon * uh
            Fx = Fx - cw * un[0]
            Fy = Fy - cw * un[1]
        if sides and config.wall_cd_sides > 0.0:
            gxs = jnp.maximum(roll(solid_0, 0, 1), roll(solid_0, 0, -1))
            gys = jnp.maximum(roll(solid_0, 1, 0), roll(solid_0, -1, 0))
            fl_ = 1.0 - solid_0[0]
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
        keep = (1.0 - solid_0[0])        # solids: accumulators hold
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

    NT = Y // T
    grid = (Z, NT)
    NYB = Y // 8         # strip blocks are 8 rows (Mosaic sublane minimum);
                         # tiled implies T % 32 == 0, hence Y % 8 == 0

    def zi(dz):          # z plane of the window, periodic
        if dz == 0:
            return lambda q, t: q
        return lambda q, t: (q + Z + dz) % Z

    def blk_lo(t):       # 8-row block holding plane row t*T - 1 (offset 7)
        return (t * (T // 8) + NYB - 1) % NYB

    def blk_hi(t):       # 8-row block holding plane row (t+1)*T (offset 0)
        return ((t + 1) * (T // 8)) % NYB

    def fi_specs(nc, dz):
        """Specs for an nc-channel DDF operand of the z+dz window: the
        (T, X) tile plus (when tiled) two 8-row strips whose last/first
        rows are the tile's below/above halo rows."""
        z = zi(dz)
        specs = [pl.BlockSpec((nc, 1, T, X),
                              lambda q, t, z=z: (0, z(q, t), t, 0))]
        if tiled:
            specs += [
                pl.BlockSpec((nc, 1, 8, X),
                             lambda q, t, z=z: (0, z(q, t), blk_lo(t), 0)),
                pl.BlockSpec((nc, 1, 8, X),
                             lambda q, t, z=z: (0, z(q, t), blk_hi(t), 0)),
            ]
        return specs

    def fl_specs(dz):
        z = zi(dz)
        specs = [pl.BlockSpec((1, T, X),
                              lambda q, t, z=z: (z(q, t), t, 0))]
        if tiled:
            specs += [
                pl.BlockSpec((1, 8, X),
                             lambda q, t, z=z: (z(q, t), blk_lo(t), 0)),
                pl.BlockSpec((1, 8, X),
                             lambda q, t, z=z: (z(q, t), blk_hi(t), 0)),
            ]
        return specs

    acc_specs = [
        pl.BlockSpec((3, 1, T, X), lambda q, t: (0, q, t, 0)),  # mean_u
        pl.BlockSpec((1, T, X), lambda q, t: (q, t, 0)),        # m2
        pl.BlockSpec((1, T, X), lambda q, t: (q, t, 0)),        # mean_rho
    ]
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)]                 # dyn row
        + fi_specs(19, 0) + fi_specs(5, -1) + fi_specs(5, +1)
        + fl_specs(-1) + fl_specs(0) + fl_specs(+1)
        + acc_specs
    )
    out_specs = list(acc_specs)
    n_in = len(in_specs)

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
        # accumulators (the last three inputs) update in place
        input_output_aliases={n_in - 3: 0, n_in - 2: 1, n_in - 1: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
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
        fl = state.flags
        rep = 3 if tiled else 1        # each family repeats per spec
        ops = ([row] + [fi] * rep + [fp] * rep + [fm] * rep
               + [fl] * (3 * rep)
               + [avg.mean_u, avg.m2_u, avg.mean_rho])
        mu, m2, mr = call(*ops)
        return AvgState(count=avg.count + 1, mean_u=mu, m2_u=m2,
                        mean_rho=mr, mean_T=avg.mean_T)

    return fused

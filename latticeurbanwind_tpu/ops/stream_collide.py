"""Fused Pallas stream-collide kernel — the performance tier (v2, pure-DDF).

TPU-native replacement for the reference's OpenCL hot loop
(reference: kernel.cpp:1475-1780 stream_collide).  Design:

  * DDFs are stored split by their z-velocity component into three arrays
    f0 (9, Z, Y, X) for cz=0, fp (5, Z, Y, X) for cz=+1, fm (5, Z, Y, X)
    for cz=-1 (lattice.GROUP0/GROUP_P/GROUP_M).  In-plane (y, x) shifts are
    register-level lane/sublane rolls — global-periodic, matching the
    reference's modular neighbor indexing.
  * Pure-DDF stepping: the kernel streams ONLY the DDF arrays and flags —
    no persistent rho/u/T fields cross HBM per step.  Moments are recomputed
    in-kernel; equilibrium-boundary (TYPE_E) and fixed-temperature (TYPE_T)
    cells FREEZE their stored equilibria (their post-collision value is the
    feq(BC) they were initialized with, so writing back their own planes
    maintains the boundary exactly).  rho/u/T are materialized on demand by
    lbm/fields.update_fields — the same split the reference uses
    (kernel.cpp:1938 update_fields; setup.cpp:4441-4494 event readbacks).
  * Plane-carry scheme: grid program q computes plane z = q-2 (two warm-up
    programs).  Each program fetches exactly ONE plane of every DDF array;
    the z-1 plane of fp, the own plane of fm, and two flags planes arrive
    through VMEM scratch carried across the sequential grid programs.  Every
    DDF plane is fetched exactly once and written exactly once: HBM traffic
    is 2 x 19 x sizeof(storage) + ~1 flag byte per cell-update — the
    reference's own roofline model (lbm.cpp:121-142).
  * Nudge/sponge face targets come from compact static FaceBC arrays
    (O(surface), fetched once per program or held in SMEM) instead of
    per-step volume reads; the Von Karman inlet updates these arrays and the
    boundary DDF slabs directly (bc/vk_inlet.py).
  * All arithmetic fp32; storage f16 (range-shifted FP16S), fp16c (the
    reference's 1-4-11 custom float, kernel.cpp:864-875), bf16 or f32.

Constraints: Z >= 3, Y/X >= 8, plane Y*X <= 256Ki cells (VMEM budget;
wide-flat grids run via the axis-permuted variant, ops/permute.py).
Multi-chip: shard_map halo runner in parallel/halo.py (ghost rows/planes),
or GSPMD over the reference tier.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..lbm.lattice import (
    C19, C7, CS, G7_0, G7_M, G7_P, GROUP0, GROUP_M, GROUP_P, OPP19,
    SMAGORINSKY_FACTOR, W19, W7,
)
from ..lbm.state import (
    DynParams,
    Forcing,
    LBMState,
    StepConfig,
    TYPE_E,
    TYPE_S,
    TYPE_T,
)

# direction index -> (group array id, index within group); group 0=f0, 1=fp, 2=fm
_D2G = {}
for _d in range(19):
    _cz = int(C19[_d, 2])
    if _cz == 0:
        _D2G[_d] = (0, _d - GROUP0.start)
    elif _cz == 1:
        _D2G[_d] = (1, _d - GROUP_P.start)
    else:
        _D2G[_d] = (2, _d - GROUP_M.start)

# D3Q7 direction -> (group id, index): g0 holds dirs 0..4 (cz=0), gp dir 5, gm dir 6
_G7_BASE = (0, 5, 6)


class FaceBC(NamedTuple):
    """Static boundary-face targets for nudging/sponge (O(surface) arrays).

    These mirror the face reference cells the reference kernel reads in-place
    (kernel.cpp:1523-1614); with pure-DDF stepping the face velocities are
    constant except under the VK inlet, whose pre-step updates these arrays.
    Layouts are z-leading for TPU tiling: uw/ue (Z, 3, Y), us/un (Z, 3, X),
    ut/ub (3, Y, X).  tt is the sponge temperature target: (Y, X) for the
    canonical orientation, (Z, X) for sponge_axis='y'.
    """

    uw: jnp.ndarray
    ue: jnp.ndarray
    us: jnp.ndarray
    un: jnp.ndarray
    ut: jnp.ndarray
    ub: jnp.ndarray
    tt: Optional[jnp.ndarray] = None


class SplitState(NamedTuple):
    """Internal pallas-tier state with cz-split DDF storage.

    rho/u/T are threaded through unchanged (STALE during stepping; refresh
    with lbm.fields.update_fields).  fbc carries the face targets so the VK
    inlet pre-step can update them inside the jitted loop.
    """

    f0: jnp.ndarray   # (9, Z, Y, X)
    fp: jnp.ndarray   # (5, Z, Y, X)
    fm: jnp.ndarray   # (5, Z, Y, X)
    rho: jnp.ndarray
    u: jnp.ndarray
    flags: jnp.ndarray
    g0: Optional[jnp.ndarray] = None  # (5, Z, Y, X)
    gp: Optional[jnp.ndarray] = None  # (1, Z, Y, X)
    gm: Optional[jnp.ndarray] = None  # (1, Z, Y, X)
    T: Optional[jnp.ndarray] = None
    fbc: Optional[FaceBC] = None
    aux: Optional[tuple] = None   # hook-carried state (e.g. VK anchor fields)


def build_face_bc(u: jnp.ndarray, T: Optional[jnp.ndarray] = None,
                  *, sponge_axis: str = "z") -> FaceBC:
    """Face targets from the initialized boundary fields (BC values)."""
    tt = None
    if T is not None:
        tt = T[-1] if sponge_axis == "z" else T[:, -1, :]
    return FaceBC(
        uw=u[:, :, :, 0].swapaxes(0, 1), ue=u[:, :, :, -1].swapaxes(0, 1),
        us=u[:, :, 0, :].swapaxes(0, 1), un=u[:, :, -1, :].swapaxes(0, 1),
        ut=u[:, -1, :, :], ub=u[:, 0, :, :], tt=tt,
    )


def split_state(state: LBMState, *, with_fbc: bool = False,
                sponge_axis: str = "z") -> SplitState:
    fi = state.fi
    kw = {}
    if state.gi is not None:
        kw = dict(g0=state.gi[G7_0], gp=state.gi[G7_P], gm=state.gi[G7_M], T=state.T)
    if with_fbc:
        kw["fbc"] = build_face_bc(state.u, state.T, sponge_axis=sponge_axis)
    return SplitState(f0=fi[GROUP0], fp=fi[GROUP_P], fm=fi[GROUP_M],
                      rho=state.rho, u=state.u, flags=state.flags, **kw)


def merge_state(s: SplitState) -> LBMState:
    """Back to LBMState.  rho/u/T are whatever was threaded through —
    refresh with lbm.fields.update_fields before consuming them."""
    fi = jnp.concatenate([s.f0, s.fp, s.fm], axis=0)
    gi = None
    if s.g0 is not None:
        gi = jnp.concatenate([s.g0, s.gp, s.gm], axis=0)
    return LBMState(fi=fi, rho=s.rho, u=s.u, flags=s.flags, gi=gi, T=s.T)


def pallas_supported(shape: Tuple[int, int, int], config: StepConfig) -> bool:
    Z, Y, X = shape
    # f16/fp16c storages run through software bit codecs (uint16 patterns);
    # all storages ride the pallas tier.  Full-plane blocks (C, 1, Y, X)
    # legalize for ANY Y, X: Mosaic allows unaligned block dims when they
    # equal the whole array dims (verified on v5e at 45x44 and 333x250).
    # The plane working set must still fit VMEM.
    return Z >= 3 and Y >= 8 and X >= 8 and Y * X <= 262144


# ---------------------------------------------------------------------------
# storage codecs (kernel-internal, int32 bit arithmetic — Mosaic has no
# IEEE f16 and no custom floats; arithmetic is always fp32)
# ---------------------------------------------------------------------------


def _make_codec(storage: str):
    """(dec, enc): storage-bits <-> fp32 plane converters inside the kernel."""
    if storage == "f32":
        return (lambda x: x), (lambda x: x)
    if storage == "bf16":
        return (lambda x: x.astype(jnp.float32)), (lambda x: x.astype(jnp.bfloat16))

    if storage == "f16":
        # FP16S: range-shifted IEEE half (reference lbm.cpp:707-710); the
        # x * 2^-15 scale rides on the exponent rebase.  Subnormal halves
        # decode to zero — below 2^-29 after unscale.
        def dec(x):
            b = x.astype(jnp.int32)
            s = (b >> 15) & 1
            e = (b >> 10) & 0x1F
            m = b & 0x3FF
            bits = (s << 31) | ((e + 112 - 15) << 23) | (m << 13)
            f = jax.lax.bitcast_convert_type(bits, jnp.float32)
            return f * (1.0 - (e == 0).astype(jnp.float32))

        def enc(x):
            # round-to-nearest-even f16 encode, FP16S scale folded into the
            # exponent rebase (+15).  Overflow saturates, underflow flushes.
            b = jax.lax.bitcast_convert_type(x, jnp.int32)
            s = (b >> 16) & 0x8000
            e = ((b >> 23) & 0xFF) + 15
            m = b & 0x7FFFFF
            he = e - 112
            m13 = m >> 13
            rest = m & 0x1FFF
            rnd = (rest + 0x0FFF + (m13 & 1)) >> 13
            h = (s | (he << 10) | m13) + rnd
            h = jnp.where(he <= 0, s, h)
            h = jnp.where(he >= 31, s | 0x7BFF, h)
            return h.astype(jnp.uint16)

        return dec, enc

    if storage == "fp16c":
        # The reference's DEFAULT DDF format: 1-4-11 custom float, exp-15,
        # range +-1.9995, denormals down to +-2.98e-8 (kernel.cpp:864-875).
        # The extra mantissa bit (11 vs 10) halves quantization error for
        # the low-velocity DDF-shifted populations.
        def dec(x):
            b = x.astype(jnp.int32)
            e = (b >> 11) & 0xF                     # 4-bit exponent
            m = (b & 0x7FF) << 12                   # mantissa -> fp32 position
            # leading-zero count of the denormal mantissa via the float
            # exponent of (float)m — the reference's "evil log2 bit hack"
            mf = jax.lax.bitcast_convert_type(m.astype(jnp.float32), jnp.int32)
            v = (mf >> 23) & 0xFF
            sgn = (b & 0x8000) << 16
            norm = ((e + 112) << 23) | m
            sh = jnp.clip(150 - v, 0, 31)          # m==0 lane: avoid UB shift
            den = ((v - 37) << 23) | ((m << sh) & 0x007FF000)
            bits = sgn | jnp.where(e != 0, norm, jnp.where(m != 0, den, 0))
            return jax.lax.bitcast_convert_type(bits, jnp.float32)

        def enc(x):
            b = jax.lax.bitcast_convert_type(x, jnp.int32) + 0x00000800  # RNE
            e = (b >> 23) & 0xFF
            m = b & 0x007FFFFF
            sgn = (b >> 16) & 0x8000
            norm = (((e - 112) << 11) & 0x7800) | (m >> 12)
            sh = jnp.clip(124 - e, 0, 31)          # flushed lanes: avoid UB shift
            den = (((0x007FF800 + m) >> sh) + 1) >> 1
            h = sgn | jnp.where(e > 112, norm,
                                jnp.where(e > 100, den, 0))
            # saturate overflow to max finite (reference utilities.hpp
            # float_to_half_custom (e > 127) * 0x7FFF term)
            h = jnp.where(e > 127, sgn | 0x7FFF, h)
            return h.astype(jnp.uint16)

        return dec, enc

    raise ValueError(f"unknown storage {storage!r}")


def _shift1(a, axis: int, c: int):
    """Periodic unit shift via slice+concat (result[i] = a[i-c]).

    Implemented with concatenate rather than pltpu.roll — the Mosaic
    compiler takes minutes per roll op but compiles slice/concat quickly.
    """
    if c == 0:
        return a
    if axis == 0:
        return (jnp.concatenate([a[-1:], a[:-1]], 0) if c > 0
                else jnp.concatenate([a[1:], a[:1]], 0))
    return (jnp.concatenate([a[:, -1:], a[:, :-1]], 1) if c > 0
            else jnp.concatenate([a[:, 1:], a[:, :1]], 1))


def _roll2(plane, cy: int, cx: int):
    """result[y, x] = plane[y-cy, x-cx] (periodic)."""
    return _shift1(_shift1(plane, 0, cy), 1, cx)


def make_pallas_step(config: StepConfig, forcing: Forcing, shape: Tuple[int, int, int],
                     halo_mode: bool = False, *, vertical_comp: int = 2,
                     sponge_axis: str = "z"):
    """Build `step(split_state, dyn) -> split_state` for a fixed grid shape.

    halo_mode=True builds the per-shard variant used under shard_map: the
    z-neighbor reads come from halo-extended arrays supplied per step
    (parallel/halo.py) instead of wrapping modularly within the local slab.

    `vertical_comp`/`sponge_axis` support the axis-permuted orientation
    (ops/permute.py): under the z<->y transposition the physically-vertical
    velocity component is index 1 and the top-sponge profile runs along the
    sublane (y) axis with the permuted north face as its reference plane.
    """
    Z, Y, X = shape
    if not pallas_supported(shape, config):
        raise NotImplementedError(f"pallas tier unsupported for shape {shape}")
    assert sponge_axis in ("z", "y")
    if halo_mode:
        # the sharded runner always operates in canonical orientation
        assert sponge_axis == "z" and vertical_comp == 2

    storage = config.storage
    thermal = config.thermal
    has_nudge = forcing.nudge_sigma is not None
    has_sponge = forcing.sponge_sigma_z is not None
    has_forcing = has_nudge or has_sponge
    nudge_vertical = forcing.nudge_vertical
    dec, enc = _make_codec(storage)

    NPROG = Z + 2  # two warm-up programs fill the plane-carry scratch

    # ---------------- kernel ----------------

    def kernel(*refs):
        it = iter(refs)
        f0_ref = next(it)      # (9,1,Y,X) @ z          (own plane)
        fp_ref = next(it)      # (5,1,Y,X) @ z          (own; z-1 from scratch)
        fm_ref = next(it)      # (5,1,Y,X) @ z+1        (stream; own from scratch)
        fl_ref = next(it)      # (1,Y,X) flags @ z+1    (z, z-1 from scratch)
        dyn_ref = next(it)     # (1,8) SMEM
        if has_forcing:
            nsig_ref = next(it)   # (1,Y,X)
            nface_ref = next(it)  # (1,Y,X) uint8
            uw_ref = next(it)     # (1,3,Y)  z-leading layout for tiling rules
            ue_ref = next(it)
            us_ref = next(it)     # (1,3,X)
            un_ref = next(it)
            ut_ref = next(it)     # (3,Y,X) static top target (fetched once)
            ub_ref = next(it)     # (3,Y,X)
            ssig_ref = next(it)   # axis z: (Z,1) SMEM profile; axis y: (Y,X) VMEM
        if thermal:
            g0_ref = next(it)     # (5,1,Y,X) @ z
            gp_ref = next(it)     # (1,1,Y,X) @ z
            gm_ref = next(it)     # (1,1,Y,X) @ z+1
            tt_ref = next(it)     # axis z: (Y,X) top T; axis y: (1,X) north row
        # outputs
        f0_out = next(it)
        fp_out = next(it)
        fm_out = next(it)
        if thermal:
            g0_out = next(it)
            gp_out = next(it)
            gm_out = next(it)
        # scratch (plane carry across sequential grid programs)
        fp_scr = next(it)      # (5,Y,X) storage bits: fp @ z-1
        fm_scr = next(it)      # (5,Y,X): fm @ z
        fl_scr = next(it)      # (2,Y,X) uint8: [z-1, z]
        if thermal:
            gp_scr = next(it)  # (1,Y,X): gp @ z-1
            gm_scr = next(it)  # (1,Y,X): gm @ z

        q = pl.program_id(0)

        @pl.when(q >= 2)
        def _compute():
            fxg = dyn_ref[0, 0]
            fyg = dyn_ref[0, 1]
            fzg = dyn_ref[0, 2]
            ox = dyn_ref[0, 3]
            oy = dyn_ref[0, 4]
            oz = dyn_ref[0, 5]

            # masks kept as f32 throughout: Mosaic's vector<i1> relayouts are
            # broken on this toolchain; widen uint8 flags to int32 first (the
            # VPU has no 8-bit compares)
            flags_c = fl_scr[1].astype(jnp.int32)
            solid_f = ((flags_c & TYPE_S) != 0).astype(jnp.float32)
            eqbc_f = ((flags_c & TYPE_E) != 0).astype(jnp.float32)

            def blend(mask_f, a, b):
                return a * mask_f + b * (1.0 - mask_f)

            # pull-source planes per group: group0 own z, group+ z-1, group- z+1
            stream_src = (
                lambda k: dec(f0_ref[k, 0]),
                lambda k: dec(fp_scr[k]),
                lambda k: dec(fm_ref[k, 0]),
            )
            # own-plane values per group (for bounce-back opposites and the
            # TYPE_E equilibrium freeze)
            own_src = (
                lambda k: dec(f0_ref[k, 0]),
                lambda k: dec(fp_ref[k, 0]),
                lambda k: dec(fm_scr[k]),
            )
            solid_src = (
                ((fl_scr[1].astype(jnp.int32) & TYPE_S) != 0).astype(jnp.float32),
                ((fl_scr[0].astype(jnp.int32) & TYPE_S) != 0).astype(jnp.float32),
                ((fl_ref[0].astype(jnp.int32) & TYPE_S) != 0).astype(jnp.float32),
            )

            # decode every own plane exactly once (Python-level reuse — the
            # opposite lookups below index this list, so the f16/fp16c bit
            # codecs don't run twice per plane)
            own = [own_src[_D2G[d][0]](_D2G[d][1]) for d in range(19)]
            f = [None] * 19
            for d in range(19):
                cx, cy, cz = (int(v) for v in C19[d])
                g, k = _D2G[d]
                shifted = _roll2(stream_src[g](k), cy, cx)
                src_solid_f = _roll2(solid_src[g], cy, cx)
                opp_plane = own[int(OPP19[d])]
                f[d] = opp_plane * src_solid_f + shifted * (1.0 - src_solid_f)

            # ---- unrolled moments (dot_general relayouts are ~10x slower) ----
            rho_m = f[0]
            for d in range(1, 19):
                rho_m = rho_m + f[d]
            rhon = rho_m + 1.0
            mom = [None, None, None]
            for d in range(1, 19):
                for a in range(3):
                    c = int(C19[d, a])
                    if c == 0:
                        continue
                    t = f[d] if c == 1 else -f[d]
                    mom[a] = t if mom[a] is None else mom[a] + t
            inv_rho = 1.0 / rhon
            un = [m * inv_rho for m in mom]

            # forces: global + Coriolis.  TYPE_E cells' outputs are frozen, so
            # their (boundary-streamed) moments feeding these terms are inert.
            Fx = fxg - 2.0 * rhon * (oy * un[2] - oz * un[1])
            Fy = fyg - 2.0 * rhon * (oz * un[0] - ox * un[2])
            Fz = fzg - 2.0 * rhon * (ox * un[1] - oy * un[0])

            not_e_f = 1.0 - eqbc_f
            if has_forcing:
                face = nface_ref[0].astype(jnp.int32)
                u_w = uw_ref[0][:, :, None]               # (3,Y,1)
                u_e = ue_ref[0][:, :, None]
                u_s = us_ref[0][:, None, :]               # (3,1,X)
                u_n = un_ref[0][:, None, :]
                u_t = ut_ref[:]                           # (3,Y,X)
                u_b = ub_ref[:]
                u_tgt = jnp.broadcast_to(u_w, (3, Y, X))
                for fidv, tgt in ((1, u_e), (2, u_s), (3, u_n), (4, u_t), (5, u_b)):
                    m = (face[None] == fidv).astype(jnp.float32)
                    u_tgt = blend(m, jnp.broadcast_to(tgt, (3, Y, X)), u_tgt)
                sig = nsig_ref[0] * not_e_f
                Fs = [Fx, Fy, Fz]
                for a in range(3):
                    if a == vertical_comp and not nudge_vertical:
                        continue
                    Fs[a] = Fs[a] + rhon * sig * (u_tgt[a] - un[a])
                if sponge_axis == "z":
                    ssig = ssig_ref[q - 2, 0]
                    sp_tgt = u_t
                else:
                    ssig = ssig_ref[:]                     # (Y,X)
                    sp_tgt = u_n                           # (3,1,X) broadcasts
                sig_sp = ssig * not_e_f
                for a in range(3):
                    Fs[a] = Fs[a] + rhon * sig_sp * (sp_tgt[a] - un[a])
                Fx, Fy, Fz = Fs

            if thermal:
                tfix_f = ((flags_c & TYPE_T) != 0).astype(jnp.float32)
                # TYPE_E cells collide g with their PRESCRIBED velocity
                # (reference kernel.cpp:1503-1515 presets rho/u for TYPE_E);
                # the prescribed value is recovered exactly as the moments of
                # the cell's own frozen equilibria.
                rho_own = own[0]
                for d in range(1, 19):
                    rho_own = rho_own + own[d]
                rho_own = rho_own + 1.0
                mom_own = [None, None, None]
                for d in range(1, 19):
                    for a in range(3):
                        c = int(C19[d, a])
                        if c == 0:
                            continue
                        t = own[d] if c == 1 else -own[d]
                        mom_own[a] = t if mom_own[a] is None else mom_own[a] + t
                inv_rho_own = 1.0 / rho_own
                un_t = [blend(eqbc_f, mom_own[a] * inv_rho_own, un[a])
                        for a in range(3)]
                g_stream = (
                    lambda k: dec(g0_ref[k, 0]),
                    lambda k: dec(gp_scr[k]),
                    lambda k: dec(gm_ref[k, 0]),
                )
                g_own = (
                    lambda k: dec(g0_ref[k, 0]),
                    lambda k: dec(gp_ref[k, 0]),
                    lambda k: dec(gm_scr[k]),
                )
                def _g7_loc(d):
                    g_id = 0 if int(C7[d, 2]) == 0 else (1 if int(C7[d, 2]) == 1 else 2)
                    return g_id, d - _G7_BASE[g_id]

                gown = [g_own[_g7_loc(d)[0]](_g7_loc(d)[1]) for d in range(7)]
                gpl = [None] * 7
                for d in range(7):
                    cx, cy, cz = (int(v) for v in C7[d])
                    g_id, k = _g7_loc(d)
                    shifted = _roll2(g_stream[g_id](k), cy, cx)
                    src_solid_f = _roll2(solid_src[g_id], cy, cx)
                    od = (0, 2, 1, 4, 3, 6, 5)[d]
                    opp_plane = gown[od]
                    gpl[d] = opp_plane * src_solid_f + shifted * (1.0 - src_solid_f)
                T_m = gpl[0]
                T_own = gown[0]
                for d in range(1, 7):
                    T_m = T_m + gpl[d]
                    T_own = T_own + gown[d]
                # at fixed-T cells the frozen populations carry T exactly:
                # their own moment IS the prescribed temperature
                Tn = blend(tfix_f, T_own + 1.0, T_m + 1.0)
                if has_forcing:
                    sig_t = (ssig if sponge_axis == "z" else ssig) * not_e_f * (1.0 - tfix_f)
                    t_tgt = tt_ref[:] if sponge_axis == "z" else tt_ref[0][None, :]
                    Tn = Tn + sig_t * (t_tgt - Tn)
                # unrolled D3Q7 equilibrium + collision, opposite pairs share cu
                Tm1_q = 0.125 * (Tn - 1.0)
                geq = [0.25 * (Tn - 1.0)]
                for d, ax in ((1, 0), (3, 1), (5, 2)):
                    cu_t = 0.5 * Tn * un_t[ax]
                    geq.append(Tm1_q + cu_t)
                    geq.append(Tm1_q - cu_t)
                keep_solid = 1.0 - solid_f
                g_post = []
                for d in range(7):
                    coll = (1.0 - config.omega_t) * gpl[d] + config.omega_t * geq[d]
                    g_post.append(blend(tfix_f, gown[d], coll) * keep_solid)
                bterm = config.beta * (Tn - config.t_avg)
                Fx = Fx - fxg * bterm
                Fy = Fy - fyg * bterm
                Fz = Fz - fzg * bterm

            # ---- Guo half-step + clamp -------------------------------------
            half = 0.5 / rhon
            FF = (Fx, Fy, Fz)
            u_star = [jnp.clip(un[a] + FF[a] * half, -CS, CS) for a in range(3)]
            ux, uy, uz = u_star

            # ---- unrolled equilibrium + Guo terms (opposite pairs share cu) ---
            c3 = -3.0 * (ux * ux + uy * uy + uz * uz)
            rhom1 = rhon - 1.0
            uF = -(1.0 / 3.0) * (ux * Fx + uy * Fy + uz * Fz)
            feq = [None] * 19
            fin = [None] * 19
            feq[0] = (1.0 / 3.0) * (rhom1 + rhon * (0.5 * c3))
            fin[0] = 3.0 * uF
            for d in range(1, 19, 2):
                cx, cy, cz = (int(v) for v in C19[d])
                w = float(W19[d])
                od = int(OPP19[d])
                cu = 3.0 * ((cx * ux if cx else 0.0)
                            + (cy * uy if cy else 0.0)
                            + (cz * uz if cz else 0.0))
                base = w * (rhom1 + rhon * (0.5 * (cu * cu + c3)))
                wcu = w * rhon * cu
                feq[d] = base + wcu
                feq[od] = base - wcu
                cF = ((cx * Fx if cx else 0.0) + (cy * Fy if cy else 0.0)
                      + (cz * Fz if cz else 0.0))
                w9 = 9.0 * w
                cu3 = cu * (1.0 / 3.0)
                # Fin_d = 9w [cF (cu/3 + 1/3) + uF]; Fin_opp with cF,cu negated
                fin[d] = w9 * (cF * (cu3 + 1.0 / 3.0) + uF)
                fin[od] = w9 * (cF * (cu3 - 1.0 / 3.0) + uF)

            # ---- unrolled Smagorinsky LES -----------------------------------
            if config.subgrid:
                H = {}
                for a in range(3):
                    for b in range(a, 3):
                        acc = None
                        for d in range(1, 19):
                            coeff = int(C19[d, a]) * int(C19[d, b])
                            if coeff == 0:
                                continue
                            t = (f[d] - feq[d]) if coeff == 1 else (feq[d] - f[d])
                            acc = t if acc is None else acc + t
                        H[(a, b)] = acc
                Q = (H[(0, 0)] ** 2 + H[(1, 1)] ** 2 + H[(2, 2)] ** 2
                     + 2.0 * (H[(0, 1)] ** 2 + H[(0, 2)] ** 2 + H[(1, 2)] ** 2))
                tau0 = 1.0 / config.omega
                omega_eff = 2.0 / (tau0 + jnp.sqrt(
                    tau0 * tau0 + SMAGORINSKY_FACTOR * jnp.sqrt(Q) / rhon))
            else:
                omega_eff = jnp.full_like(rhon, config.omega)

            # TYPE_E cells freeze their stored equilibria; solid cells zero
            keep_fluid = (1.0 - solid_f) * (1.0 - eqbc_f)
            sel_eq = eqbc_f * (1.0 - solid_f)
            f_post = [None] * 19
            if config.collision == "srt":
                cfin = 1.0 - 0.5 * omega_eff
                one_m_w = 1.0 - omega_eff
                for d in range(19):
                    coll = one_m_w * f[d] + omega_eff * feq[d] + cfin * fin[d]
                    f_post[d] = coll * keep_fluid + own[d] * sel_eq
            else:
                wp = omega_eff
                wm = 1.0 / (0.1875 / (1.0 / wp - 0.5) + 0.5)
                c_taup = 0.5 - 0.25 * wp
                c_taum = 0.5 - 0.25 * wm
                for d in range(19):
                    od = int(OPP19[d])
                    fin_t = c_taup * (fin[d] + fin[od]) + c_taum * (fin[d] - fin[od])
                    coll = (f[d] + 0.5 * wp * (feq[d] - f[d] + feq[od] - f[od])
                            + 0.5 * wm * (feq[d] - feq[od] - f[d] + f[od]) + fin_t)
                    f_post[d] = coll * keep_fluid + own[d] * sel_eq

            for k in range(9):
                f0_out[k, 0] = enc(f_post[GROUP0.start + k])
            for k in range(5):
                fp_out[k, 0] = enc(f_post[GROUP_P.start + k])
                fm_out[k, 0] = enc(f_post[GROUP_M.start + k])
            if thermal:
                for k in range(5):
                    g0_out[k, 0] = enc(g_post[k])
                gp_out[0, 0] = enc(g_post[5])
                gm_out[0, 0] = enc(g_post[6])

        # ---- plane-carry scratch rotation (runs every program) -------------
        fl_scr[0] = fl_scr[1]
        fl_scr[1] = fl_ref[0]
        fp_scr[:] = fp_ref[:, 0]
        fm_scr[:] = fm_ref[:, 0]
        if thermal:
            gp_scr[:] = gp_ref[:, 0]
            gm_scr[:] = gm_ref[:, 0]

    # ---------------- specs ----------------

    v = partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    sm = partial(pl.BlockSpec, memory_space=pltpu.SMEM)

    def own_map(q):        # plane z = q-2, clamped for warm-ups
        return jnp.maximum(q - 2, 0)

    if halo_mode:
        # halo-extended inputs: fp_ext[:, e] = fp @ z=e-1 (e=0 is the below-
        # shard halo), fm_ext[:, e] = fm @ z=e (e=Z is the above-shard halo),
        # flags_ext[e] = flags @ z=e-1 (below halo at 0, above halo at Z+1).
        fp_map = lambda q: (0, jnp.clip(q - 1, 0, Z), 0, 0)
        fm_map = lambda q: (0, jnp.clip(q - 1, 0, Z), 0, 0)
        fl_map = lambda q: (jnp.clip(q, 0, Z + 1), 0, 0)
    else:
        fp_map = lambda q: (0, (q - 2) % Z, 0, 0)
        fm_map = lambda q: (0, (q - 1) % Z, 0, 0)
        fl_map = lambda q: ((q - 1) % Z, 0, 0)

    sdt = {"f32": jnp.float32, "f16": jnp.uint16, "fp16c": jnp.uint16,
           "bf16": jnp.bfloat16}[storage]

    in_specs = [
        v((9, 1, Y, X), lambda q: (0, own_map(q), 0, 0)),
        v((5, 1, Y, X), fp_map),
        v((5, 1, Y, X), fm_map),
        v((1, Y, X), fl_map),
        sm((1, 8), lambda q: (0, 0)),
    ]
    if has_forcing:
        in_specs += [
            v((1, Y, X), lambda q: (own_map(q), 0, 0)),
            v((1, Y, X), lambda q: (own_map(q), 0, 0)),
            v((1, 3, Y), lambda q: (own_map(q), 0, 0)),
            v((1, 3, Y), lambda q: (own_map(q), 0, 0)),
            v((1, 3, X), lambda q: (own_map(q), 0, 0)),
            v((1, 3, X), lambda q: (own_map(q), 0, 0)),
            v((3, Y, X), lambda q: (0, 0, 0)),   # top plane target (one fetch)
            v((3, Y, X), lambda q: (0, 0, 0)),   # bottom plane target
        ]
        if sponge_axis == "z":
            in_specs += [sm((Z, 1), lambda q: (0, 0))]
        else:
            in_specs += [v((Y, X), lambda q: (0, 0))]
    if thermal:
        in_specs += [
            v((5, 1, Y, X), lambda q: (0, own_map(q), 0, 0)),
            v((1, 1, Y, X), fp_map),
            v((1, 1, Y, X), fm_map),
            (v((Y, X), lambda q: (0, 0)) if sponge_axis == "z"
             else v((1, X), lambda q: (own_map(q), 0))),
        ]

    out_shapes = [
        jax.ShapeDtypeStruct((9, Z, Y, X), sdt),
        jax.ShapeDtypeStruct((5, Z, Y, X), sdt),
        jax.ShapeDtypeStruct((5, Z, Y, X), sdt),
    ]
    out_specs = [
        v((9, 1, Y, X), lambda q: (0, own_map(q), 0, 0)),
        v((5, 1, Y, X), lambda q: (0, own_map(q), 0, 0)),
        v((5, 1, Y, X), lambda q: (0, own_map(q), 0, 0)),
    ]
    if thermal:
        out_shapes += [
            jax.ShapeDtypeStruct((5, Z, Y, X), sdt),
            jax.ShapeDtypeStruct((1, Z, Y, X), sdt),
            jax.ShapeDtypeStruct((1, Z, Y, X), sdt),
        ]
        out_specs += [
            v((5, 1, Y, X), lambda q: (0, own_map(q), 0, 0)),
            v((1, 1, Y, X), lambda q: (0, own_map(q), 0, 0)),
            v((1, 1, Y, X), lambda q: (0, own_map(q), 0, 0)),
        ]

    scratch = [
        pltpu.VMEM((5, Y, X), sdt),
        pltpu.VMEM((5, Y, X), sdt),
        pltpu.VMEM((2, Y, X), jnp.uint8),
    ]
    if thermal:
        scratch += [pltpu.VMEM((1, Y, X), sdt), pltpu.VMEM((1, Y, X), sdt)]

    import os

    call = pl.pallas_call(
        kernel,
        grid=(NPROG,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        # large (Y, X) planes need more than the 16 MiB default scoped VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        interpret=bool(os.environ.get("LUW_PALLAS_INTERPRET")),
    )

    # closure forcing arrays (the sharded runner overrides via forcing_loc)
    if sponge_axis == "z":
        sponge_z = (
            np.asarray(forcing.sponge_sigma_z, dtype=np.float32).reshape(Z, 1)
            if has_sponge else np.zeros((Z, 1), dtype=np.float32)
        )
    else:
        prof = (np.asarray(forcing.sponge_sigma_z, dtype=np.float32)
                if has_sponge else np.zeros(Y, dtype=np.float32))
        assert prof.shape == (Y,), (prof.shape, Y)
        sponge_z = np.broadcast_to(prof[:, None], (Y, X))
    nudge_sigma = (
        forcing.nudge_sigma if has_nudge else jnp.zeros((Z, Y, X), jnp.float32)
    )
    nudge_face = (
        forcing.nudge_face.astype(jnp.uint8) if has_nudge
        else jnp.zeros((Z, Y, X), jnp.uint8)
    )
    sponge_z = jnp.asarray(sponge_z)

    if storage in ("f16",):
        # Mosaic has no IEEE f16: DDFs cross the kernel boundary as uint16
        # bit patterns (free XLA bitcasts outside the kernel)
        def bits(a):
            return jax.lax.bitcast_convert_type(a, jnp.uint16)

        def unbits(a):
            return jax.lax.bitcast_convert_type(a, jnp.float16)
    else:
        def bits(a):
            return a

        def unbits(a):
            return a

    def step(s: SplitState, dyn: DynParams, *, fp_halo=None, fm_halo=None,
             flb_halo=None, fla_halo=None, gp_halo=None, gm_halo=None,
             forcing_loc=None) -> SplitState:
        """`forcing_loc` (sharded path): dict overriding the closure forcing
        with per-shard slices — keys nudge_sigma (zs,Y,X), nudge_face,
        sponge_z (zs,1).  Face targets always come from s.fbc when forcing
        is active (build_face_bc)."""
        dyn_arr = jnp.concatenate([
            dyn.force.astype(jnp.float32),
            dyn.omega_coriolis.astype(jnp.float32),
            jnp.zeros(2, jnp.float32),
        ]).reshape(1, 8)
        if halo_mode:
            fp_in = jnp.concatenate([fp_halo, s.fp], axis=1)      # (5, Z+1, Y, X)
            fm_in = jnp.concatenate([s.fm, fm_halo], axis=1)
            fl_in = jnp.concatenate([flb_halo, s.flags, fla_halo], axis=0)
        else:
            fp_in, fm_in, fl_in = s.fp, s.fm, s.flags
        args = [bits(s.f0), bits(fp_in), bits(fm_in), fl_in, dyn_arr]
        if has_forcing:
            fl = forcing_loc or {}
            fbc = s.fbc
            if fbc is None:
                raise ValueError("forcing is active but SplitState.fbc is None "
                                 "— build the split state with with_fbc=True")
            args += [
                fl.get("nudge_sigma", nudge_sigma),
                fl.get("nudge_face", nudge_face),
                fbc.uw, fbc.ue, fbc.us, fbc.un, fbc.ut, fbc.ub,
                fl.get("sponge_z", sponge_z),
            ]
        if thermal:
            if halo_mode:
                gp_in = jnp.concatenate([gp_halo, s.gp], axis=1)
                gm_in = jnp.concatenate([s.gm, gm_halo], axis=1)
            else:
                gp_in, gm_in = s.gp, s.gm
            if has_forcing:
                t_tgt = s.fbc.tt
            else:
                t_tgt = (s.T[-1] if sponge_axis == "z" else s.T[:, -1, :])
            args += [bits(s.g0), bits(gp_in), bits(gm_in), t_tgt]
        out = call(*args)
        if thermal:
            f0, fp, fm, g0, gp, gm = out
            return s._replace(f0=unbits(f0), fp=unbits(fp), fm=unbits(fm),
                              g0=unbits(g0), gp=unbits(gp), gm=unbits(gm))
        f0, fp, fm = out
        return s._replace(f0=unbits(f0), fp=unbits(fp), fm=unbits(fm))

    return step

"""Fused Pallas stream-collide kernel — the performance tier (v3, y-tiled).

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
  * Plane-carry scheme: grid program (j, q) computes plane z = q-2 of y-tile
    j (two warm-up programs per tile).  Each program fetches exactly ONE
    tile-plane of every DDF array; the z-1 plane of fp, the own plane of fm,
    and two flags planes arrive through VMEM scratch carried across the
    sequential grid programs.  Every DDF plane is fetched exactly once and
    written exactly once: HBM traffic is 2 x 19 x sizeof(storage) + ~1 flag
    byte per cell-update — the reference's own roofline model
    (lbm.cpp:121-142).
  * y-tiling (v3): when the full (Y, X) plane exceeds the VMEM budget, the
    plane splits into J = Y/By equal y-tiles marched tile-by-tile (grid
    (J, Z+2)).  Cross-tile y-shifts read PACKED NEIGHBOR ROWS: per (tile, z)
    one (NR, X) slab holding the below/above boundary rows of every streamed
    plane (f0@z, fp@z-1, fm@z+1, solid masks, thermal), gathered outside the
    kernel by XLA from static row indices.  Packing all channels into one
    slab amortizes Mosaic's 8-sublane block granularity: extra traffic is
    ~NR/(19*By) (a few percent).  This removes the reference contract gap
    where only <=512x512 footprints ran the fast tier (the reference runs
    one work-item per cell at ANY local size, kernel.cpp:1486, lbm.cpp:1125).
  * Scratch planes carry DECODED fp32 values (not storage bits), so the
    f16/fp16c software codecs run exactly once per fetched plane: 19 decodes
    + 19 encodes per cell-update (+7/+7 thermal), the minimum possible.
  * Nudge/sponge face targets come from compact static FaceBC arrays
    (O(surface)) instead of per-step volume reads; the Von Karman inlet
    updates these arrays and the boundary DDF slabs directly (bc/vk_inlet.py).
  * All arithmetic fp32; storage f16 (range-shifted FP16S), fp16c (the
    reference's 1-4-11 custom float, kernel.cpp:864-875), bf16 or f32.

Constraints: Z >= 3, Y/X >= 8; tiled planes need a By | Y with By % 32 == 0
and By*X within the VMEM plane budget (tile_plan).  Multi-chip: shard_map
halo runner in parallel/halo.py (ghost rows/planes) — composes with tiling,
so any local slab shape runs the fast tier.
"""

from __future__ import annotations

from functools import partial
import os
from typing import NamedTuple, Optional, Tuple

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
    encode_ddf,
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

# z-mirror of each GROUP_P direction (cx,cy,+1) -> GROUP_M index of
# (cx,cy,-1), used by the wall-model specular reflection
_MIR_P = [
    next(m for m in range(5)
         if (int(C19[GROUP_M.start + m, 0]) == int(C19[GROUP_P.start + k, 0])
             and int(C19[GROUP_M.start + m, 1]) == int(C19[GROUP_P.start + k, 1])))
    for k in range(5)
]


def _axis_mirror(d: int, axis: int):
    """Global index of direction d mirrored about the x (axis=0) or y
    (axis=1) face — same z-group by construction — or None when the
    direction has no component along that axis (wall_sides specular)."""
    cx, cy, cz = (int(v) for v in C19[d])
    if (axis == 0 and cx == 0) or (axis == 1 and cy == 0):
        return None
    tgt = (-cx, cy, cz) if axis == 0 else (cx, -cy, cz)
    return next(m for m in range(19)
                if tuple(int(v) for v in C19[m]) == tgt)


_MIR_X = [_axis_mirror(_d, 0) for _d in range(19)]
_MIR_Y = [_axis_mirror(_d, 1) for _d in range(19)]

# VMEM working-set budget for one (By, X) tile-plane (cells).  Measured on
# v5e: the full in-kernel f32 intermediate set at 256Ki cells fits the 128 MiB
# VMEM with the 120 MiB scoped limit below.  The thermal kernel carries the
# D3Q7 sub-lattice on top (gown/gpl/geq/g_post + gp/gm scratch ≈ +7/19 of
# the f-group planes), so its budget is scaled down accordingly.
PLANE_BUDGET = 262144
THERMAL_BUDGET_FRACTION = 0.7
# Production configs (forcing/nudge + wall models) carry a larger live set
# than the flagship bench config the 256Ki budget was measured with: the
# 4 m CaseE plane (499x506 = 252k cells, wall model + Guo forcing + nudge)
# measures 500 B/cell of scoped stack and overflows the 120 MiB limit by
# 5% untiled.  Configs that compile any of those stages in use a reduced
# budget so such planes y-tile instead (sizing pads Y to a 32-multiple).
HEAVY_BUDGET_FRACTION = 0.85


def config_budget_heavy(config: "StepConfig") -> bool:
    """True when `config` compiles stages beyond the flagship bench set
    (Guo forcing / wall models) — these grow the kernel's scoped-VMEM
    stack, so tile_plan must budget for them."""
    return bool(config.volume_force or config.wall_model or config.wall_sides)


class FaceBC(NamedTuple):
    """Static boundary-face targets for nudging/sponge (O(surface) arrays).

    These mirror the face reference cells the reference kernel reads in-place
    (kernel.cpp:1523-1614); with pure-DDF stepping the face velocities are
    constant except under the VK inlet, whose pre-step updates these arrays.
    Layouts are z-leading for TPU tiling: uw/ue (Z, 3, Y), us/un (Z, 3, X),
    ut/ub (3, Y, X).  tt is the sponge temperature target: (Y, X) for the
    canonical orientation.
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
    # y-tiled kernels carry each (tile, z)'s boundary rows (first row in
    # rows_lo, last in rows_hi, layout R_* slots) — written by the kernel as
    # extra outputs, so cross-tile shifts never re-gather rows from HBM
    rows_lo: Optional[jnp.ndarray] = None   # (J, Z, NRh, X) storage bits
    rows_hi: Optional[jnp.ndarray] = None


def build_face_bc(u: jnp.ndarray, T: Optional[jnp.ndarray] = None) -> FaceBC:
    """Face targets from the initialized boundary fields (BC values)."""
    tt = None
    if T is not None:
        tt = T[-1]
    return FaceBC(
        uw=u[:, :, :, 0].swapaxes(0, 1), ue=u[:, :, :, -1].swapaxes(0, 1),
        us=u[:, :, 0, :].swapaxes(0, 1), un=u[:, :, -1, :].swapaxes(0, 1),
        ut=u[:, -1, :, :], ub=u[:, 0, :, :], tt=tt,
    )


def split_state(state: LBMState, *, with_fbc: bool = False) -> SplitState:
    fi = state.fi
    kw = {}
    if state.gi is not None:
        kw = dict(g0=state.gi[G7_0], gp=state.gi[G7_P], gm=state.gi[G7_M], T=state.T)
    if with_fbc:
        kw["fbc"] = build_face_bc(state.u, state.T)
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


def tile_plan(Y: int, X: int, thermal: bool = False,
              heavy: bool = False) -> Optional[int]:
    """Rows-per-tile By for the y-tiled kernel (J = Y // By tiles).

    Y*X <= budget runs untiled (By = Y; Mosaic allows unaligned block
    dims when they equal the whole array dims, so ANY Y, X legalize).
    Larger planes tile by y into equal blocks: By must divide Y and be a
    multiple of 32 (uint8 flags sublane packing).  Returns None when no
    legal tiling exists (then the jnp/GSPMD tier serves the shape).
    Thermal kernels get a reduced budget (their D3Q7 planes enlarge the
    in-kernel working set the PLANE_BUDGET was measured without), as do
    heavy configs (forcing/wall stages — config_budget_heavy)."""
    budget = int(os.environ.get("LUW_PLANE_BUDGET", 0)) or PLANE_BUDGET
    if thermal:
        budget = int(budget * THERMAL_BUDGET_FRACTION)
    if heavy:
        budget = int(budget * HEAVY_BUDGET_FRACTION)
    if Y * X <= budget:
        return Y
    best = None
    for by in range(32, Y, 32):
        if Y % by == 0 and by * X <= budget:
            best = by
    return best


def pallas_supported(shape: Tuple[int, int, int], config: StepConfig) -> bool:
    # f16/fp16c storages run through software bit codecs (uint16 patterns);
    # all storages ride the pallas tier.  Any plane whose y-tiling fits the
    # VMEM budget is supported (reference contract: per-cell kernel at any
    # local domain size, kernel.cpp:1486).
    return pallas_reject_reason(shape, config) is None


def pallas_reject_reason(shape: Tuple[int, int, int],
                         config: StepConfig) -> Optional[str]:
    """None when the fast tier serves `shape`, else one sentence naming the
    failed constraint — surfaced by the stepper so a deck that silently
    falls off the fast tier explains its ~40x slowdown up front."""
    Z, Y, X = shape
    if Z < 3:
        return f"Z={Z} < 3 (plane-carry scratch needs three z planes)"
    if Y < 8 or X < 8:
        return f"plane {Y}x{X} below the 8x8 minimum (TPU sublane/lane tile)"
    heavy = config_budget_heavy(config)
    if tile_plan(Y, X, thermal=config.thermal, heavy=heavy) is None:
        budget = int(os.environ.get("LUW_PLANE_BUDGET", 0)) or PLANE_BUDGET
        if config.thermal:
            budget = int(budget * THERMAL_BUDGET_FRACTION)
        if heavy:
            budget = int(budget * HEAVY_BUDGET_FRACTION)
        return (f"no legal y-tiling: Y*X = {Y}*{X} = {Y * X} exceeds the "
                f"VMEM plane budget ({budget}) and no multiple-of-32 "
                f"divisor of Y={Y} brings a tile under it (pad Y to a "
                "32-multiple with a small factor — run/sizing."
                "apply_fast_tier does this for deck grids)")
    return None


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
        # x * 2^-15 scale rides on the decode/encode power-of-two constants.
        #
        # Magic-relocate decode + raw-bit-trick encode (round-5 codec lab
        # winner, +6% kernel MLUPs over the value-space formulation):
        # decode relocates the half's e/m fields into the f32 layout by
        # integer add + bitcast — no int->float convert on the normal path
        # — with denormal halves recovered by the magic subtract; encode
        # scales |x| so the half exponent lands at the f32 exponent field
        # and rounds RNE by adding 0xFFF + lsb on the raw bits (the carry
        # rolls the exponent correctly at power-of-two boundaries).
        # Verified bit-identical to the IEEE jnp-tier codec on all 65536
        # codes (decode) and a 650k-point sweep of every exponent band
        # (encode), on CPU and on the real chip (tools/codec_lab.py check).
        def dec(x):
            b = x.astype(jnp.int32)
            bits = ((b & 0x7FFF) << 13) + (97 << 23)
            nrm = jax.lax.bitcast_convert_type(bits, jnp.float32)
            den = (nrm - np.float32(2.0 ** -30)) * 2.0
            v = jnp.where((b & 0x7C00) != 0, nrm, den)
            sgnbits = (b & 0x8000) << 16
            return jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(v, jnp.int32) | sgnbits,
                jnp.float32)

        def enc(x):
            a = jnp.abs(x)
            b = jax.lax.bitcast_convert_type(
                a * np.float32(2.0 ** -97), jnp.int32)
            c = jnp.minimum((b + 0xFFF + ((b >> 13) & 1)) >> 13, 0x7BFF)
            den = jax.lax.round(a * np.float32(2.0 ** 39),
                                jax.lax.RoundingMethod.TO_NEAREST_EVEN
                                ).astype(jnp.int32)
            c = jnp.where(a < np.float32(2.0 ** -29), den, c)
            sgn = (jax.lax.bitcast_convert_type(x, jnp.int32) >> 16) & 0x8000
            return (sgn | c).astype(jnp.uint16)

        return dec, enc

    if storage == "fp16c":
        # The reference's DEFAULT DDF format: 1-4-11 custom float, exp-15,
        # range +-1.9995, denormals down to +-2.98e-8 (kernel.cpp:864-875).
        # The extra mantissa bit (11 vs 10) halves quantization error for
        # the low-velocity DDF-shifted populations.
        #
        # Magic-relocate decode + raw-bit-trick encode (round-5 codec lab
        # winner: 2329 -> 2587 MLUPs at 256^3 on v5e, +11%): decode
        # relocates the 4/11 e/m fields into the f32 layout by integer add
        # + bitcast (no int->float convert on the normal path; denormals
        # via the magic subtract), encode scales |x| into f32 exponent
        # space and rounds with the reference's +0x800 raw-bit add (the
        # carry rolls the exponent at power-of-two boundaries), with one
        # denormal-band select.  Verified bit-identical to the reference
        # bit-twiddling formulas (state.encode/decode_fp16c) over all
        # 65536 code points (decode) and a dense sweep of every f32
        # exponent band incl. exact ties (encode), on CPU and on the real
        # chip (tools/codec_lab.py check); the one intended difference:
        # NaNs saturate to ±0x7FFF here, while the reference's +0x800 RNE
        # add overflows some NaN payloads to 0.
        def dec(x):
            b = x.astype(jnp.int32)
            bits = ((b & 0x7FFF) << 12) + (112 << 23)
            nrm = jax.lax.bitcast_convert_type(bits, jnp.float32)
            den = (nrm - np.float32(2.0 ** -15)) * 2.0
            v = jnp.where((b & 0x7800) != 0, nrm, den)
            sgnbits = (b & 0x8000) << 16
            return jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(v, jnp.int32) | sgnbits,
                jnp.float32)

        def enc(x):
            a = jnp.abs(x)
            b = jax.lax.bitcast_convert_type(
                a * np.float32(2.0 ** -112), jnp.int32)
            c = jnp.minimum((b + 0x800) >> 12, 0x7FFF)
            den = (a * np.float32(2.0 ** 25) + 0.5).astype(jnp.int32)
            c = jnp.where(a < np.float32(2.0 ** -14), den, c)
            sgn = (jax.lax.bitcast_convert_type(x, jnp.int32) >> 16) & 0x8000
            return (sgn | c).astype(jnp.uint16)

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


def _rollt(tile, below, above, cy: int, cx: int):
    """Tile-aware roll: result[y, x] = src[y-cy, x-cx] where the rows
    entering from outside the tile come from `below` / `above` (1, X)."""
    if cy > 0:
        p = jnp.concatenate([below, tile[:-1]], 0)
    elif cy < 0:
        p = jnp.concatenate([tile[1:], above], 0)
    else:
        p = tile
    return _shift1(p, 1, cx)


def make_pallas_step(config: StepConfig, forcing: Forcing, shape: Tuple[int, int, int],
                     halo_mode: bool = False, *, vk=None,
                     vk_offsets: Tuple[int, int] = (0, 0)):
    """Build `step(split_state, dyn) -> split_state` for a fixed grid shape.

    halo_mode=True builds the per-shard variant used under shard_map: the
    z-neighbor reads come from halo-extended arrays supplied per step
    (parallel/halo.py) instead of wrapping modularly within the local slab.

    `vk` is the inlet kernel spec exported by the VK hook
    (bc/vk_inlet.py ddf_pre_step.kernel_spec): {"sites": ((kind, field),..),
    "masks": {field: array}}.  The kernel then OVERWRITES the listed
    boundary sites of its outputs with feq(rho=1, FaceBC velocity) blended
    by the static masks — the inlet application rides the kernel's existing
    boundary-plane writes instead of post-hoc XLA scatter updates (which
    cost multiples of a whole step in minor-dim dynamic-update-slices).
    The VK hook must then run PRE-step: the kernel at step t emits
    feq(realization t), which neighbors stream during t+1 — the same timing
    as the reference's vk_inlet_apply before run(1) (setup.cpp:4869-4880).
    `vk_offsets` = (gy, gx) ghost widths shift the lane/row site indices
    under the ghost-sharded runner.
    """
    Z, Y, X = shape
    if not pallas_supported(shape, config):
        raise NotImplementedError(f"pallas tier unsupported for shape {shape}")

    By = tile_plan(Y, X, thermal=config.thermal,
                   heavy=config_budget_heavy(config))
    J = Y // By
    tiled = J > 1

    storage = config.storage
    thermal = config.thermal
    has_nudge = forcing.nudge_sigma is not None
    has_sponge = forcing.sponge_sigma_z is not None
    has_forcing = has_nudge or has_sponge
    use_force = config.volume_force
    if not use_force and (has_forcing or thermal):
        raise ValueError("volume_force=False requires no nudge/sponge "
                         "forcing and no thermal buoyancy")
    has_faces = has_forcing or vk is not None
    vk_sites = tuple(vk["sites"]) if vk else ()
    # apply full planes first, then rows, then lanes: later sites read the
    # current output back (dec o enc idempotent at mask 0/1), so overlaps
    # at corners and the top plane resolve to the owning face's value
    _SITE_ORDER = {"planeL": 0, "plane0": 0, "row0": 1, "rowL": 1,
                   "lane0": 2, "laneL": 2}
    vk_sites = tuple(sorted(vk_sites, key=lambda s: _SITE_ORDER[s[0]]))
    gyo, gxo = vk_offsets
    nudge_vertical = forcing.nudge_vertical
    dec, enc = _make_codec(storage)

    NPROG = Z + 2  # two warm-up programs fill the plane-carry scratch (per tile)

    # carried boundary-row slot layout (tiled path): rows_lo holds row 0 of
    # each (tile, z), rows_hi holds row By-1 — written by the kernel itself
    # as extra (1, 1, NRh, X) outputs (a copy of rows it just computed), so
    # the cross-tile y-shifts cost ~2*NRh/(19*By) extra traffic instead of
    # the pathological strided XLA row gather (~1 us per row DMA).
    R_F0, R_FP, R_FM, R_SOL = 0, 9, 14, 19
    R_G0, R_GP, R_GM = 20, 25, 26
    NRH = 27 if thermal else 20

    # ---------------- kernel ----------------

    def kernel(*refs):
        it = iter(refs)
        f0_ref = next(it)      # (9,1,By,X) @ z          (own plane)
        fp_ref = next(it)      # (5,1,By,X) @ z          (own; z-1 from scratch)
        fm_ref = next(it)      # (5,1,By,X) @ z+1        (stream; own from scratch)
        fl_ref = next(it)      # (1,By,X) flags @ z+1    (z, z-1 from scratch)
        if tiled:
            # neighbor tiles' carried boundary rows @ z+1 (z, z-1 arrive
            # through the rows scratch rotation, like the flags planes)
            rlo_ref = next(it)   # (1,1,NRh,X): tile j+1's row 0 ("above")
            rhi_ref = next(it)   # (1,1,NRh,X): tile j-1's row By-1 ("below")
        dyn_ref = next(it)     # (1,8) SMEM
        if has_forcing:
            nsig_ref = next(it)   # (1,By,X)
            nface_ref = next(it)  # (1,By,X) uint8
        if has_faces:
            uw_ref = next(it)     # (1,By,3)  y-major: the By block lands on
            ue_ref = next(it)     #   the SUBLANE dim (any 8-multiple legal);
            us_ref = next(it)     # (1,3,X)   a lane-dim By block would need
            un_ref = next(it)     #   By%128, which Y=672-style grids can't give
            ut_ref = next(it)     # (3,By,X) static top target
            ub_ref = next(it)     # (3,By,X)
        if has_forcing:
            ssig_ref = next(it)   # axis z: (Z,1) SMEM profile; axis y: (By,X) VMEM
        vk_mask_refs = [next(it) for _ in vk_sites]
        if thermal:
            g0_ref = next(it)     # (5,1,By,X) @ z
            gp_ref = next(it)     # (1,1,By,X) @ z
            gm_ref = next(it)     # (1,1,By,X) @ z+1
            tt_ref = next(it)     # axis z: (By,X) top T; axis y: (1,X) north row
        # outputs
        f0_out = next(it)
        fp_out = next(it)
        fm_out = next(it)
        if thermal:
            g0_out = next(it)
            gp_out = next(it)
            gm_out = next(it)
        if tiled:
            rlo_out = next(it)   # (1,1,NRh,X) this tile's row 0 @ z
            rhi_out = next(it)   # (1,1,NRh,X) this tile's row By-1 @ z
        # scratch (plane carry across sequential grid programs, DECODED f32 —
        # the bit codecs run once per fetched plane)
        fp_scr = next(it)      # (5,By,X) f32: fp @ z-1
        fm_scr = next(it)      # (5,By,X) f32: fm @ z
        fl_scr = next(it)      # (2,By,X) uint8: [z-1, z]
        if thermal:
            gp_scr = next(it)  # (1,By,X) f32: gp @ z-1
            gm_scr = next(it)  # (1,By,X) f32: gm @ z
        if tiled:
            rlo_scr = next(it)  # (2,NRh,X) storage bits: rows_lo @ [z-1, z]
            rhi_scr = next(it)  # (2,NRh,X)

        q = pl.program_id(1)
        jprog = pl.program_id(0)

        # own fp / stream fm planes decoded once per program: used for the
        # own-value opposites now AND written decoded into the carry scratch
        dfp = dec(fp_ref[:, 0])
        dfm = dec(fm_ref[:, 0])
        if thermal:
            dgp = dec(gp_ref[:, 0])
            dgm = dec(gm_ref[:, 0])

        @pl.when(q >= 2)
        def _compute():
            if use_force:
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

            # every plane decoded exactly once; stream group0 = own group0
            own_f0 = [dec(f0_ref[k, 0]) for k in range(9)]
            own_fp = [dfp[k] for k in range(5)]
            own_fm = [fm_scr[k] for k in range(5)]       # carried f32
            st_fp = [fp_scr[k] for k in range(5)]        # carried f32
            st_fm = [dfm[k] for k in range(5)]

            sol_m1 = ((fl_scr[0].astype(jnp.int32) & TYPE_S) != 0).astype(jnp.float32)
            sol_p1 = ((fl_ref[0].astype(jnp.int32) & TYPE_S) != 0).astype(jnp.float32)

            # neighbor rows (tiled): below = tile j-1's row By-1 (rows_hi),
            # above = tile j+1's row 0 (rows_lo); z-1/z planes from the
            # scratch rotation, z+1 from this program's fetch.  Decoded
            # lazily, once per used (side, zkind, slot).
            row_cache = {}

            def row(side, zk, slot):
                key = (side, zk, slot)
                if key not in row_cache:
                    scr = (rhi_scr, rlo_scr)[side]
                    ref = (rhi_ref, rlo_ref)[side]
                    if zk == 2:
                        r = ref[0, 0, slot:slot + 1, :]
                    else:
                        r = scr[zk, slot:slot + 1, :]     # 0: z-1, 1: z
                    row_cache[key] = dec(r)
                return row_cache[key]

            # group -> z-kind of its stream source: g0 @ z (1), g+ @ z-1
            # (0), g- @ z+1 (2)
            _GZK = (1, 0, 2)

            def src(g, k):
                """(tile, below, above) of the STREAM source for group g."""
                tile = (own_f0, st_fp, st_fm)[g][k]
                if tiled:
                    slot = (R_F0, R_FP, R_FM)[g] + k
                    zk = _GZK[g]
                    return tile, row(0, zk, slot), row(1, zk, slot)
                return tile, tile[-1:], tile[:1]

            def solsrc(g):
                tile = (solid_f, sol_m1, sol_p1)[g]
                if tiled:
                    zk = _GZK[g]
                    return tile, row(0, zk, R_SOL), row(1, zk, R_SOL)
                return tile, tile[-1:], tile[:1]

            # own-plane values per direction (bounce-back opposites and the
            # TYPE_E equilibrium freeze)
            own = [(own_f0, own_fp, own_fm)[_D2G[d][0]][_D2G[d][1]]
                   for d in range(19)]
            f = [None] * 19
            for d in range(19):
                cx, cy, cz = (int(v) for v in C19[d])
                g, k = _D2G[d]
                tile, bel, abv = src(g, k)
                shifted = _rollt(tile, bel, abv, cy, cx)
                stile, sbel, sabv = solsrc(g)
                src_solid_f = _rollt(stile, sbel, sabv, cy, cx)
                repl = own[int(OPP19[d])]
                if config.wall_sides and _MIR_Y[d] is not None:
                    # specular off vertical y faces: mirror channel lives
                    # in the SAME z-group, pulled from the same source
                    # plane with the y shift dropped (tangential advection
                    # keeps cx); fluid-partner check on that plane.
                    # Priority matches reference._stream: y, then x, then
                    # ground z (later blend dominates).
                    myg, myk = _D2G[_MIR_Y[d]]
                    mt, mb, ma = src(myg, myk)
                    spec = _rollt(mt, mb, ma, 0, cx)
                    nbr_sol = _rollt(stile, sbel, sabv, 0, cx)
                    repl = repl * nbr_sol + spec * (1.0 - nbr_sol)
                if config.wall_sides and _MIR_X[d] is not None:
                    mxg, mxk = _D2G[_MIR_X[d]]
                    mt, mb, ma = src(mxg, mxk)
                    spec = _rollt(mt, mb, ma, cy, 0)
                    nbr_sol = _rollt(stile, sbel, sabv, cy, 0)
                    repl = repl * nbr_sol + spec * (1.0 - nbr_sol)
                if config.wall_model and cz == 1:
                    # specular off horizontal faces: mirror fm DDF at the
                    # OWN plane, shifted in-plane — free-slip ground/roofs
                    # (the Schumann stress below restores log-law drag);
                    # corners (solid in-plane partner) keep bounce-back.
                    mk = _MIR_P[k]
                    mtile = own_fm[mk]
                    if tiled:
                        mbel, mabv = row(0, 1, R_FM + mk), row(1, 1, R_FM + mk)
                    else:
                        mbel, mabv = mtile[-1:], mtile[:1]
                    spec = _rollt(mtile, mbel, mabv, cy, cx)
                    s0tile, s0bel, s0abv = solsrc(0)   # solid @ own plane
                    nbr_sol = _rollt(s0tile, s0bel, s0abv, cy, cx)
                    repl = repl * nbr_sol + spec * (1.0 - nbr_sol)
                f[d] = repl * src_solid_f + shifted * (1.0 - src_solid_f)

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
            # volume_force=False compiles the whole forcing path out — the
            # reference's VOLUME_FORCE off build (defines.hpp) — saving the
            # Guo VPU work in the vanilla/benchmark configuration.
            if use_force:
                Fx = fxg - 2.0 * rhon * (oy * un[2] - oz * un[1])
                Fy = fyg - 2.0 * rhon * (oz * un[0] - ox * un[2])
                Fz = fzg - 2.0 * rhon * (ox * un[1] - oy * un[0])
                if config.wall_model:
                    # Schumann wall stress at first fluid cell above a
                    # horizontal solid face (fluid here & solid directly
                    # below — both flag planes already in scratch)
                    ga = (1.0 - solid_f) * sol_m1
                    uh = jnp.sqrt(un[0] * un[0] + un[1] * un[1])
                    cw = config.wall_cd * ga * rhon * uh
                    Fx = Fx - cw * un[0]
                    Fy = Fy - cw * un[1]
                if config.wall_sides and config.wall_cd_sides > 0.0:
                    # tangential stress beside vertical faces: x faces
                    # drag (v, w), y faces drag (u, w); masks from the own
                    # flag plane's in-plane neighbors (0/1 floats: OR=max)
                    s0t, s0b, s0a = solsrc(0)
                    gxs = jnp.maximum(_rollt(s0t, s0b, s0a, 0, 1),
                                      _rollt(s0t, s0b, s0a, 0, -1))
                    gys = jnp.maximum(_rollt(s0t, s0b, s0a, 1, 0),
                                      _rollt(s0t, s0b, s0a, -1, 0))
                    fl_ = 1.0 - solid_f
                    ut_x = jnp.sqrt(un[1] * un[1] + un[2] * un[2])
                    ut_y = jnp.sqrt(un[0] * un[0] + un[2] * un[2])
                    cwx = config.wall_cd_sides * fl_ * gxs * rhon * ut_x
                    cwy = config.wall_cd_sides * fl_ * gys * rhon * ut_y
                    Fx = Fx - cwy * un[0]
                    Fy = Fy - cwx * un[1]
                    Fz = Fz - (cwx + cwy) * un[2]

            not_e_f = 1.0 - eqbc_f
            if has_forcing:
                face = nface_ref[0].astype(jnp.int32)
                u_w = uw_ref[0]                           # (By,3) y-major
                u_e = ue_ref[0]
                u_s = us_ref[0]                           # (3,X)
                u_n = un_ref[0]
                fmask = [(face == fidv).astype(jnp.float32)
                         for fidv in (1, 2, 3, 4, 5)]
                sig = nsig_ref[0] * not_e_f
                ssig = ssig_ref[q - 2, 0]
                sig_sp = ssig * not_e_f
                Fs = [Fx, Fy, Fz]
                for a in range(3):
                    # per-component target build: west default, face-id blends
                    tgt = jnp.broadcast_to(u_w[:, a:a + 1], (By, X))
                    for m, t in zip(fmask, (u_e[:, a:a + 1], u_s[a][None, :],
                                            u_n[a][None, :], ut_ref[a],
                                            ub_ref[a])):
                        tgt = blend(m, jnp.broadcast_to(t, (By, X)), tgt)
                    if not (a == 2 and not nudge_vertical):
                        # vertical component: nudge u,v only
                        Fs[a] = Fs[a] + rhon * sig * (tgt - un[a])
                    # sponge pulls every component toward the top target
                    Fs[a] = Fs[a] + rhon * sig_sp * (ut_ref[a] - un[a])
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
                gown = [dec(g0_ref[k, 0]) for k in range(5)] + [dgp[0], gm_scr[0]]
                g_st = gown[:5] + [gp_scr[0], dgm[0]]

                def g_src(d):
                    g_id = 0 if int(C7[d, 2]) == 0 else (1 if int(C7[d, 2]) == 1 else 2)
                    if g_id == 0:
                        tile, slot = g_st[d], R_G0 + d
                    elif g_id == 1:
                        tile, slot = g_st[5], R_GP
                    else:
                        tile, slot = g_st[6], R_GM
                    if tiled:
                        zk = _GZK[g_id]
                        return g_id, tile, row(0, zk, slot), row(1, zk, slot)
                    return g_id, tile, tile[-1:], tile[:1]

                gpl = [None] * 7
                for d in range(7):
                    cx, cy, cz = (int(v) for v in C7[d])
                    g_id, tile, bel, abv = g_src(d)
                    shifted = _rollt(tile, bel, abv, cy, cx)
                    stile, sbel, sabv = solsrc(g_id)
                    src_solid_f = _rollt(stile, sbel, sabv, cy, cx)
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
                    sig_t = ssig * not_e_f * (1.0 - tfix_f)
                    t_tgt = tt_ref[:]
                    Tn = Tn + sig_t * (t_tgt - Tn)
                # unrolled D3Q7 equilibrium + collision, opposite pairs share
                # cu; weights from lattice.W7 (w0=1/4, ws=1/8)
                Tm1_q = float(W7[1]) * (Tn - 1.0)
                geq = [float(W7[0]) * (Tn - 1.0)]
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
            if use_force:
                half = 0.5 / rhon
                FF = (Fx, Fy, Fz)
                u_star = [jnp.clip(un[a] + FF[a] * half, -CS, CS)
                          for a in range(3)]
            else:
                u_star = [jnp.clip(un[a], -CS, CS) for a in range(3)]
            ux, uy, uz = u_star

            # ---- unrolled equilibrium + Guo terms (opposite pairs share cu) ---
            c3 = -3.0 * (ux * ux + uy * uy + uz * uz)
            rhom1 = rhon - 1.0
            uF = (-(1.0 / 3.0) * (ux * Fx + uy * Fy + uz * Fz)
                  if use_force else None)
            feq = [None] * 19
            fin = [None] * 19
            feq[0] = (1.0 / 3.0) * (rhom1 + rhon * (0.5 * c3))
            if use_force:
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
                if not use_force:
                    continue
                cF = ((cx * Fx if cx else 0.0) + (cy * Fy if cy else 0.0)
                      + (cz * Fz if cz else 0.0))
                w9 = 9.0 * w
                cu3 = cu * (1.0 / 3.0)
                # Fin_d = 9w [cF (cu/3 + 1/3) + uF]; Fin_opp with cF,cu negated
                fin[d] = w9 * (cF * (cu3 + 1.0 / 3.0) + uF)
                fin[od] = w9 * (cF * (cu3 - 1.0 / 3.0) + uF)

            # ---- unrolled Smagorinsky LES -----------------------------------
            if config.subgrid:
                # non-equilibrium parts computed ONCE and reused by all six
                # stress components (each f-feq difference otherwise repeats
                # per (a,b) pair — ~40 extra VPU subs/cell)
                fneq = [None] + [f[d] - feq[d] for d in range(1, 19)]
                H = {}
                for a in range(3):
                    for b in range(a, 3):
                        acc = None
                        for d in range(1, 19):
                            coeff = int(C19[d, a]) * int(C19[d, b])
                            if coeff == 0:
                                continue
                            if acc is None:
                                acc = fneq[d] if coeff == 1 else -fneq[d]
                            else:
                                acc = (acc + fneq[d]) if coeff == 1 \
                                    else (acc - fneq[d])
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
                cfin = (1.0 - 0.5 * omega_eff) if use_force else None
                one_m_w = 1.0 - omega_eff
                for d in range(19):
                    coll = one_m_w * f[d] + omega_eff * feq[d]
                    if use_force:
                        coll = coll + cfin * fin[d]
                    f_post[d] = coll * keep_fluid + own[d] * sel_eq
            else:
                wp = omega_eff
                wm = 1.0 / (0.1875 / (1.0 / wp - 0.5) + 0.5)
                c_taup = 0.5 - 0.25 * wp
                c_taum = 0.5 - 0.25 * wm
                for d in range(19):
                    od = int(OPP19[d])
                    coll = (f[d] + 0.5 * wp * (feq[d] - f[d] + feq[od] - f[od])
                            + 0.5 * wm * (feq[d] - feq[od] - f[d] + f[od]))
                    if use_force:
                        coll = coll + (c_taup * (fin[d] + fin[od])
                                       + c_taum * (fin[d] - fin[od]))
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

            # ---- VK inlet sites: overwrite boundary outputs with --------
            # ---- feq(rho=1, FaceBC velocity), mask-blended --------------
            if vk_sites:
                def feq_vk(ux, uy, uz):
                    """DDF-shifted D3Q19 equilibria at rho=1 (matches the
                    inlet contract: boundary density pinned at 1)."""
                    c3v = -3.0 * (ux * ux + uy * uy + uz * uz)
                    fe = [None] * 19
                    fe[0] = (1.0 / 3.0) * (0.5 * c3v)
                    for d in range(1, 19, 2):
                        cx, cy, cz = (int(v) for v in C19[d])
                        w = float(W19[d])
                        od = int(OPP19[d])
                        cu = 3.0 * ((cx * ux if cx else 0.0)
                                    + (cy * uy if cy else 0.0)
                                    + (cz * uz if cz else 0.0))
                        b = w * (0.5 * (cu * cu + c3v))
                        fe[d] = b + w * cu
                        fe[od] = b - w * cu
                    return fe

                def out_of(d):
                    g, k = _D2G[d]
                    return (f0_out, fp_out, fm_out)[g], k

                def blend_writes(fe, m, sl_y, sl_x):
                    # read the CURRENT output back so overlapping sites
                    # compose (masks are exactly 0/1; dec(enc(x)) -> enc(x))
                    for d in range(19):
                        oref, k = out_of(d)
                        cur = dec(oref[k, 0, sl_y, sl_x])
                        oref[k, 0, sl_y, sl_x] = enc(
                            m * fe[d] + (1.0 - m) * cur)

                for si, (kind, field) in enumerate(vk_sites):
                    mref = vk_mask_refs[si]
                    if kind in ("lane0", "laneL"):
                        lane = gxo if kind == "lane0" else X - 1 - gxo
                        uv = (uw_ref if field == "uw" else ue_ref)[0]
                        m = mref[0]                              # (By, 1)
                        fe = feq_vk(uv[:, 0:1], uv[:, 1:2], uv[:, 2:3])
                        blend_writes(fe, m, slice(None), slice(lane, lane + 1))
                    elif kind in ("row0", "rowL"):
                        t_idx = 0 if kind == "row0" else J - 1
                        r = gyo if kind == "row0" else By - 1 - gyo
                        uv = (us_ref if field == "us" else un_ref)[0]
                        m = mref[0, 0][None, :]                  # (1, X)
                        fe = feq_vk(uv[0][None, :], uv[1][None, :],
                                    uv[2][None, :])

                        def _row_site(fe=fe, m=m, r=r, t_idx=t_idx):
                            blend_writes(fe, m, slice(r, r + 1), slice(None))

                        pl.when(jprog == t_idx)(_row_site)
                    else:                                        # plane sites
                        qsite = NPROG - 1 if kind == "planeL" else 2
                        uv = (ut_ref if field == "ut" else ub_ref)[:]
                        m = mref[:]                              # (By, X)
                        fe = feq_vk(uv[0], uv[1], uv[2])

                        def _plane_site(fe=fe, m=m):
                            blend_writes(fe, m, slice(None), slice(None))

                        pl.when(q == qsite)(_plane_site)

            if tiled:
                # carry this tile's boundary rows for the next step — encoded
                # copies of the final outputs (including inlet overwrites)
                for k in range(9):
                    rlo_out[0, 0, R_F0 + k:R_F0 + k + 1, :] = \
                        f0_out[k, 0, 0:1, :]
                    rhi_out[0, 0, R_F0 + k:R_F0 + k + 1, :] = \
                        f0_out[k, 0, By - 1:By, :]
                for k in range(5):
                    rlo_out[0, 0, R_FP + k:R_FP + k + 1, :] = \
                        fp_out[k, 0, 0:1, :]
                    rhi_out[0, 0, R_FP + k:R_FP + k + 1, :] = \
                        fp_out[k, 0, By - 1:By, :]
                    rlo_out[0, 0, R_FM + k:R_FM + k + 1, :] = \
                        fm_out[k, 0, 0:1, :]
                    rhi_out[0, 0, R_FM + k:R_FM + k + 1, :] = \
                        fm_out[k, 0, By - 1:By, :]
                rlo_out[0, 0, R_SOL:R_SOL + 1, :] = enc(solid_f[0:1])
                rhi_out[0, 0, R_SOL:R_SOL + 1, :] = enc(solid_f[By - 1:By])
                if thermal:
                    for k in range(5):
                        rlo_out[0, 0, R_G0 + k:R_G0 + k + 1, :] = \
                            g0_out[k, 0, 0:1, :]
                        rhi_out[0, 0, R_G0 + k:R_G0 + k + 1, :] = \
                            g0_out[k, 0, By - 1:By, :]
                    rlo_out[0, 0, R_GP:R_GP + 1, :] = gp_out[0, 0, 0:1, :]
                    rhi_out[0, 0, R_GP:R_GP + 1, :] = gp_out[0, 0, By - 1:By, :]
                    rlo_out[0, 0, R_GM:R_GM + 1, :] = gm_out[0, 0, 0:1, :]
                    rhi_out[0, 0, R_GM:R_GM + 1, :] = gm_out[0, 0, By - 1:By, :]

        # ---- plane-carry scratch rotation (runs every program) -------------
        fl_scr[0] = fl_scr[1]
        fl_scr[1] = fl_ref[0]
        fp_scr[:] = dfp
        fm_scr[:] = dfm
        if thermal:
            gp_scr[:] = dgp
            gm_scr[:] = dgm
        if tiled:
            rlo_scr[0] = rlo_scr[1]
            rlo_scr[1] = rlo_ref[0, 0]
            rhi_scr[0] = rhi_scr[1]
            rhi_scr[1] = rhi_ref[0, 0]

    # ---------------- specs ----------------

    v = partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    sm = partial(pl.BlockSpec, memory_space=pltpu.SMEM)

    def zo(q):             # own plane z = q-2, clamped for warm-ups
        return jnp.maximum(q - 2, 0)

    if halo_mode:
        # halo-extended inputs: fp_ext[:, e] = fp @ z=e-1 (e=0 is the below-
        # shard halo), fm_ext[:, e] = fm @ z=e (e=Z is the above-shard halo),
        # flags_ext[e] = flags @ z=e-1 (below halo at 0, above halo at Z+1).
        zfp = lambda q: jnp.clip(q - 1, 0, Z)
        zfm = lambda q: jnp.clip(q - 1, 0, Z)
        zfl = lambda q: jnp.clip(q, 0, Z + 1)
    else:
        zfp = lambda q: (q - 2) % Z
        zfm = lambda q: (q - 1) % Z
        zfl = lambda q: (q - 1) % Z

    sdt = {"f32": jnp.float32, "f16": jnp.uint16, "fp16c": jnp.uint16,
           "bf16": jnp.bfloat16}[storage]

    in_specs = [
        v((9, 1, By, X), lambda j, q: (0, zo(q), j, 0)),
        v((5, 1, By, X), lambda j, q: (0, zfp(q), j, 0)),
        v((5, 1, By, X), lambda j, q: (0, zfm(q), j, 0)),
        v((1, By, X), lambda j, q: (zfl(q), j, 0)),
    ]
    if tiled:
        # carried rows @ z+1 enter per program (z/z-1 via scratch rotation,
        # same cadence as the flags planes — zfl covers all three)
        in_specs += [
            v((1, 1, NRH, X), lambda j, q: ((j + 1) % J, zfl(q), 0, 0)),
            v((1, 1, NRH, X), lambda j, q: ((j - 1) % J, zfl(q), 0, 0)),
        ]
    in_specs += [sm((1, 8), lambda j, q: (0, 0))]
    if has_forcing:
        in_specs += [
            v((1, By, X), lambda j, q: (zo(q), j, 0)),
            v((1, By, X), lambda j, q: (zo(q), j, 0)),
        ]
    if has_faces:
        in_specs += [
            # uw/ue arrive y-major (Z, Y, 3): the tiled By block must sit on
            # the sublane dim (any 32-multiple legal); a (1, 3, By) lane
            # block needs By % 128 == 0, which shapes like Y=672 can't give
            v((1, By, 3), lambda j, q: (zo(q), j, 0)),
            v((1, By, 3), lambda j, q: (zo(q), j, 0)),
            v((1, 3, X), lambda j, q: (zo(q), 0, 0)),
            v((1, 3, X), lambda j, q: (zo(q), 0, 0)),
            v((3, By, X), lambda j, q: (0, j, 0)),   # top plane target
            v((3, By, X), lambda j, q: (0, j, 0)),   # bottom plane target
        ]
    if has_forcing:
        in_specs += [sm((Z, 1), lambda j, q: (0, 0))]
    for kind, _field in vk_sites:
        if kind in ("lane0", "laneL"):       # mask arrives y-major (Z, Y, 1)
            in_specs += [v((1, By, 1), lambda j, q: (zo(q), j, 0))]
        elif kind in ("row0", "rowL"):       # mask (Z, 1, X)
            in_specs += [v((1, 1, X), lambda j, q: (zo(q), 0, 0))]
        else:                                # mask (Y, X)
            in_specs += [v((By, X), lambda j, q: (j, 0))]
    if thermal:
        in_specs += [
            v((5, 1, By, X), lambda j, q: (0, zo(q), j, 0)),
            v((1, 1, By, X), lambda j, q: (0, zfp(q), j, 0)),
            v((1, 1, By, X), lambda j, q: (0, zfm(q), j, 0)),
            v((By, X), lambda j, q: (j, 0)),
        ]

    out_shapes = [
        jax.ShapeDtypeStruct((9, Z, Y, X), sdt),
        jax.ShapeDtypeStruct((5, Z, Y, X), sdt),
        jax.ShapeDtypeStruct((5, Z, Y, X), sdt),
    ]
    out_specs = [
        v((9, 1, By, X), lambda j, q: (0, zo(q), j, 0)),
        v((5, 1, By, X), lambda j, q: (0, zo(q), j, 0)),
        v((5, 1, By, X), lambda j, q: (0, zo(q), j, 0)),
    ]
    if thermal:
        out_shapes += [
            jax.ShapeDtypeStruct((5, Z, Y, X), sdt),
            jax.ShapeDtypeStruct((1, Z, Y, X), sdt),
            jax.ShapeDtypeStruct((1, Z, Y, X), sdt),
        ]
        out_specs += [
            v((5, 1, By, X), lambda j, q: (0, zo(q), j, 0)),
            v((1, 1, By, X), lambda j, q: (0, zo(q), j, 0)),
            v((1, 1, By, X), lambda j, q: (0, zo(q), j, 0)),
        ]
    if tiled:
        out_shapes += [jax.ShapeDtypeStruct((J, Z, NRH, X), sdt)] * 2
        out_specs += [v((1, 1, NRH, X), lambda j, q: (j, zo(q), 0, 0))] * 2

    scratch = [
        pltpu.VMEM((5, By, X), jnp.float32),
        pltpu.VMEM((5, By, X), jnp.float32),
        pltpu.VMEM((2, By, X), jnp.uint8),
    ]
    if thermal:
        scratch += [pltpu.VMEM((1, By, X), jnp.float32),
                    pltpu.VMEM((1, By, X), jnp.float32)]
    if tiled:
        scratch += [pltpu.VMEM((2, NRH, X), sdt),
                    pltpu.VMEM((2, NRH, X), sdt)]

    call = pl.pallas_call(
        kernel,
        grid=(J, NPROG),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        # large (By, X) planes need more than the 16 MiB default scoped VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        interpret=bool(os.environ.get("LUW_PALLAS_INTERPRET")),
    )

    # closure forcing arrays (the stepper/sharded runner override via
    # forcing_loc).  The no-nudge (sponge-only) defaults stay None here and
    # are built lazily inside step() — every production caller overrides
    # them, so eager (Z,Y,X) zeros would just pin ~5 B/cell of HBM per
    # runner for nothing.
    sponge_z = (
        np.asarray(forcing.sponge_sigma_z, dtype=np.float32).reshape(Z, 1)
        if has_sponge else np.zeros((Z, 1), dtype=np.float32)
    )
    nudge_sigma = forcing.nudge_sigma if has_nudge else None
    nudge_face = forcing.nudge_face.astype(jnp.uint8) if has_nudge else None
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

    if tiled:
        def enc_host(x):
            return bits(encode_ddf(x, storage))

        def _edge_rows(arr, r):
            """(C, Z, Y, X) -> (J, Z, C, X): row r of every y-tile."""
            C_ = int(arr.shape[0])
            v = arr.reshape(C_, Z, J, By, X)[:, :, :, r, :]
            return v.transpose(2, 1, 0, 3)

        def init_rows(s: SplitState):
            """(rows_lo, rows_hi) for the CURRENT split state — the slow
            strided extraction, paid once per chunk (the kernel maintains
            the rows as extra outputs afterwards).  Own-plane layout: slot
            z of tile j holds that tile's boundary rows at plane z."""
            solb = enc_host(((s.flags.astype(jnp.int32) & TYPE_S) != 0)
                            .astype(jnp.float32))[None]

            def side(r):
                parts = [_edge_rows(bits(s.f0), r), _edge_rows(bits(s.fp), r),
                         _edge_rows(bits(s.fm), r), _edge_rows(solb, r)]
                if thermal:
                    parts += [_edge_rows(bits(s.g0), r),
                              _edge_rows(bits(s.gp), r),
                              _edge_rows(bits(s.gm), r)]
                return jnp.concatenate(parts, axis=2)

            return side(0), side(By - 1)
    else:
        init_rows = None

    vk_masks = dict(vk["masks"]) if vk else {}

    def step(s: SplitState, dyn: DynParams, *, fp_halo=None, fm_halo=None,
             flb_halo=None, fla_halo=None, gp_halo=None, gm_halo=None,
             rlo_hb=None, rlo_ha=None, rhi_hb=None, rhi_ha=None,
             forcing_loc=None, vk_loc=None) -> SplitState:
        """`forcing_loc` (sharded path): dict overriding the closure forcing
        with per-shard slices — keys nudge_sigma (zs,Y,X), nudge_face,
        sponge_z (zs,1).  Face targets always come from s.fbc when forcing
        or the VK inlet is active (build_face_bc).  `vk_loc` overrides the
        closure inlet masks with per-shard sliced/ownership-masked ones.
        Tiled kernels additionally consume/produce the carried boundary-row
        arrays (s.rows_lo/rows_hi — seed with step.init_rows once per
        chunk); rlo_hb/... are their z-halo planes under z-sharding."""
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
        f0b, fpb, fmb = bits(s.f0), bits(fp_in), bits(fm_in)
        args = [f0b, fpb, fmb, fl_in]
        if thermal:
            if halo_mode:
                gp_in = jnp.concatenate([gp_halo, s.gp], axis=1)
                gm_in = jnp.concatenate([s.gm, gm_halo], axis=1)
            else:
                gp_in, gm_in = s.gp, s.gm
            g0b, gpb, gmb = bits(s.g0), bits(gp_in), bits(gm_in)
        if tiled:
            if s.rows_lo is None:
                raise ValueError("tiled kernel needs the carried rows — seed "
                                 "the split state via step.init_rows")
            if halo_mode:
                rlo_in = jnp.concatenate([rlo_hb, s.rows_lo, rlo_ha], axis=1)
                rhi_in = jnp.concatenate([rhi_hb, s.rows_hi, rhi_ha], axis=1)
            else:
                rlo_in, rhi_in = s.rows_lo, s.rows_hi
            args += [rlo_in, rhi_in]
        args += [dyn_arr]
        fl = forcing_loc or {}
        if has_faces:
            fbc = s.fbc
            if fbc is None:
                raise ValueError("forcing/inlet is active but SplitState.fbc "
                                 "is None — build the split state with "
                                 "with_fbc=True")
        if has_forcing:
            ns = fl.get("nudge_sigma", nudge_sigma)
            nf = fl.get("nudge_face", nudge_face)
            if ns is None:       # sponge-only caller without an override:
                ns = jnp.zeros((Z, Y, X), jnp.float32)   # traced broadcast,
            if nf is None:       # not a committed closure buffer
                nf = jnp.zeros((Z, Y, X), jnp.uint8)
            args += [ns, nf]
        if has_faces:
            # uw/ue cross the kernel boundary y-major (Z, Y, 3) — see the
            # in_specs note; FaceBC keeps the (Z, 3, Y) public layout and the
            # transpose is a ~MB-scale XLA shuffle per step
            args += [fbc.uw.swapaxes(1, 2), fbc.ue.swapaxes(1, 2),
                     fbc.us, fbc.un, fbc.ut, fbc.ub]
        if has_forcing:
            args += [fl.get("sponge_z", sponge_z)]
        if vk_sites:
            vl = vk_loc or {}
            for _kind, field in vk_sites:
                m = vl.get(field, vk_masks[field])
                if _kind in ("lane0", "laneL"):   # (Z, 1, Y) -> (Z, Y, 1)
                    m = m.swapaxes(1, 2)
                args.append(m)
        if thermal:
            if has_forcing:
                t_tgt = s.fbc.tt
            else:
                t_tgt = s.T[-1]
            args += [g0b, gpb, gmb, t_tgt]
        out = list(call(*args))
        rep = {}
        if tiled:
            rep["rows_hi"] = out.pop()
            rep["rows_lo"] = out.pop()
        if thermal:
            f0, fp, fm, g0, gp, gm = out
            rep.update(f0=unbits(f0), fp=unbits(fp), fm=unbits(fm),
                       g0=unbits(g0), gp=unbits(gp), gm=unbits(gm))
        else:
            f0, fp, fm = out
            rep.update(f0=unbits(f0), fp=unbits(fp), fm=unbits(fm))
        return s._replace(**rep)

    step.uses_rows = tiled
    step.init_rows = init_rows
    return step

"""On-demand field materialization: rho/u[/T] from the DDF arrays.

The performance tier steps DDFs only (ops/stream_collide.py); rho/u/T in an
LBMState are stale during stepping.  `update_fields` recomputes them — the
TPU analog of the reference's update_fields kernel (kernel.cpp:1938-2028,
invoked from the event/readback paths setup.cpp:4441-4494).  Cost: one
19-DDF read + rho/u write, paid only at event steps (unsteady VTKs, Welford
samples, probes, checkpoints).

Semantics follow the reference exactly:
  * populations are STREAMED first (the stored DDFs are post-collision;
    the physical pre-collision state of the next step is what the fields
    report), with halfway bounce-back from solid sources;
  * the Guo half-step force correction uses the global force + Coriolis
    (+ Boussinesq buoyancy), then the stability clamp — the reference skips
    the nudge/sponge forces here too;
  * TYPE_E cells report their own frozen equilibria's moments, which equal
    the prescribed BC values by construction (the reference instead skips
    them because it presets the arrays externally — same result);
  * solid cells keep their existing rho/u/T (never computed, masked in
    outputs by the fluid flag).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .lattice import C7, C19, CS, OPP7, OPP19
from .state import DynParams, LBMState, StepConfig, TYPE_E, TYPE_S, TYPE_T, decode_ddf


def _stream_moments_sides(fi, solid, C, OPP, storage, wall_model):
    """Per-direction variant of _stream_moments for wall_sides configs:
    with x/y mirrors enabled nearly every direction is mirror-coupled, so
    the opposite-pair scan decomposition no longer applies.  A lax.scan
    over single directions keeps the live set bounded; each step decodes
    the direction, its opposite and its (up to three) mirror channels by
    traced index and streams with the same mirror priority as
    reference._stream (y, then x, then z — later select wins)."""
    import numpy as np

    n = int(fi.shape[0])
    C_l = [tuple(int(v) for v in c) for c in np.asarray(C)]
    mirror = {c: i for i, c in enumerate(C_l)}

    ds, ods, mxs, mys, mzs, cs, mmask = [], [], [], [], [], [], []
    for d in range(1, n):
        cx, cy, cz = C_l[d]
        ds.append(d)
        ods.append(int(OPP[d]))
        my = mirror.get((cx, -cy, cz), d) if cy != 0 else d
        mx = mirror.get((-cx, cy, cz), d) if cx != 0 else d
        mz = mirror.get((cx, cy, -1), d) if (wall_model and cz == 1) else d
        mys.append(my)
        mxs.append(mx)
        mzs.append(mz)
        cs.append((cx, cy, cz))
        mmask.append((float(cy != 0), float(cx != 0),
                      float(wall_model and cz == 1)))

    rest = decode_ddf(fi[0], storage)
    zeros3 = jnp.zeros((3, *rest.shape), jnp.float32)
    solid_f = solid

    def _troll(a, sh):
        # roll with traced per-axis shifts (lax.scan body)
        for ax in range(3):
            a = jnp.roll(a, sh[ax], axis=ax)
        return a

    def body(carry, x):
        rho_s, mom_s, rho_o, mom_o = carry
        d, od, my, mx, mz, c, mm = x
        f_d = decode_ddf(fi[d], storage)
        f_od = decode_ddf(fi[od], storage)
        cz, cy, cx = c[2], c[1], c[0]
        pulled = _troll(f_d, (cz, cy, cx))
        src_solid = _troll(solid_f, (cz, cy, cx))
        repl = f_od
        # y mirror (tangential partner shift drops the y component)
        spec = _troll(decode_ddf(fi[my], storage), (cz, 0, cx))
        nbr = _troll(solid_f, (cz, 0, cx))
        repl = jnp.where((mm[0] > 0) & ~nbr, spec, repl)
        # x mirror
        spec = _troll(decode_ddf(fi[mx], storage), (cz, cy, 0))
        nbr = _troll(solid_f, (cz, cy, 0))
        repl = jnp.where((mm[1] > 0) & ~nbr, spec, repl)
        # z (ground) mirror last: dominates at corners
        spec = _troll(decode_ddf(fi[mz], storage), (0, cy, cx))
        nbr = _troll(solid_f, (0, cy, cx))
        repl = jnp.where((mm[2] > 0) & ~nbr, spec, repl)
        s_d = jnp.where(src_solid, repl, pulled)
        cf = c.astype(jnp.float32)[:, None, None, None]
        return (rho_s + s_d, mom_s + cf * s_d,
                rho_o + f_d, mom_o + cf * f_d), None

    xs = (jnp.asarray(ds, jnp.int32), jnp.asarray(ods, jnp.int32),
          jnp.asarray(mys, jnp.int32), jnp.asarray(mxs, jnp.int32),
          jnp.asarray(mzs, jnp.int32),
          jnp.asarray(np.array(cs, np.int32)),
          jnp.asarray(np.array(mmask, np.float32)))
    (rho_s, mom_s, rho_o, mom_o), _ = jax.lax.scan(
        body, (rest, zeros3, rest, zeros3), xs)
    return 1.0 + rho_s, mom_s, 1.0 + rho_o, mom_o


def _stream_moments(fi, solid, C, OPP, storage, wall_model=False):
    """(rho_streamed, mom_streamed, rho_own, mom_own) via a lax.scan over
    opposite-direction pairs.

    Never materializes the full decoded (Q, Z, Y, X) f32 lattice — at
    production sizes (10^8+ cells) that single temporary is ~10 GB and OOMs
    HBM.  The scan bounds the live set to the 8 accumulator planes plus a
    couple of per-pair temporaries (XLA's list scheduler keeps far more
    alive when the loop is unrolled).

    wall_model=True mirrors the step tiers' specular ground reflection for
    the cz=+1 directions.  The specular mirror of a diagonal-up direction
    lives in the PARTNER opposite-pair, so those four pairs run as two
    unrolled quads after the scan (each channel still decoded once)."""
    import numpy as np

    n = int(fi.shape[0])
    pairs = [(d, int(OPP[d])) for d in range(1, n) if int(OPP[d]) > d]
    quad_pairs = []
    if wall_model:
        # diagonal cz != 0 pairs couple in quads through the z-mirror;
        # the pure-vertical pair's mirror IS its opposite (spec == bb)
        quad_pairs = [p for p in pairs
                      if int(C[p[0]][2]) != 0
                      and (int(C[p[0]][0]) != 0 or int(C[p[0]][1]) != 0)]
        pairs = [p for p in pairs if p not in quad_pairs]
    ds = jnp.asarray(np.array([p[0] for p in pairs], np.int32))
    ods = jnp.asarray(np.array([p[1] for p in pairs], np.int32))
    cs = jnp.asarray(np.array([C[p[0]] for p in pairs], np.int32))  # (P, 3)

    rest = decode_ddf(fi[0], storage)
    shape = rest.shape
    zeros3 = jnp.zeros((3, *shape), jnp.float32)

    def body(carry, x):
        rho_s, mom_s, rho_o, mom_o = carry
        d, od, c = x
        a = decode_ddf(fi[d], storage)
        b = decode_ddf(fi[od], storage)
        sh = (c[2], c[1], c[0])
        nsh = (-c[2], -c[1], -c[0])
        sa = jnp.where(jnp.roll(solid, sh, (0, 1, 2)), b,
                       jnp.roll(a, sh, (0, 1, 2)))
        sb = jnp.where(jnp.roll(solid, nsh, (0, 1, 2)), a,
                       jnp.roll(b, nsh, (0, 1, 2)))
        cf = c.astype(jnp.float32)[:, None, None, None]
        return (rho_s + (sa + sb), mom_s + cf * (sa - sb),
                rho_o + (a + b), mom_o + cf * (a - b)), None

    (rho_s, mom_s, rho_o, mom_o), _ = jax.lax.scan(
        body, (rest, zeros3, rest, zeros3), (ds, ods, cs))

    if quad_pairs:
        def _idx(c):
            return next(i for i in range(n)
                        if tuple(int(v) for v in C[i]) == c)

        done = set()
        for d, od in quad_pairs:
            if d in done:
                continue
            cx, cy = int(C[d][0]), int(C[d][1])
            a_i, b_i = d, od                      # a = (cx,cy,+1)
            m_i = _idx((cx, cy, -1))              # mirror of a
            w_i = int(OPP[m_i])                   # (-cx,-cy,+1)
            done.update((a_i, b_i, m_i, w_i))
            ch = {i: decode_ddf(fi[i], storage)
                  for i in (a_i, b_i, m_i, w_i)}
            for up_i, dn_opp_i, mir_i in ((a_i, b_i, m_i), (w_i, m_i, b_i)):
                ux_, uy_ = int(C[up_i][0]), int(C[up_i][1])
                sh = (1, uy_, ux_)
                psh = (0, uy_, ux_)               # in-plane partner shift
                pulled = jnp.roll(ch[up_i], sh, (0, 1, 2))
                src_sol = jnp.roll(solid, sh, (0, 1, 2))
                nbr_sol = jnp.roll(solid, psh, (0, 1, 2))
                spec = jnp.roll(ch[mir_i], psh, (0, 1, 2))
                repl = jnp.where(nbr_sol, ch[dn_opp_i], spec)
                s_up = jnp.where(src_sol, repl, pulled)
                # downward partner of this up direction: plain bounce-back
                dsh = (-1, -uy_, -ux_)
                s_dn = jnp.where(jnp.roll(solid, dsh, (0, 1, 2)), ch[up_i],
                                 jnp.roll(ch[dn_opp_i], dsh, (0, 1, 2)))
                cf = jnp.asarray([ux_, uy_, 1],
                                 jnp.float32)[:, None, None, None]
                rho_s = rho_s + s_up + s_dn
                mom_s = mom_s + cf * (s_up - s_dn)
                rho_o = rho_o + ch[up_i] + ch[dn_opp_i]
                mom_o = mom_o + cf * (ch[up_i] - ch[dn_opp_i])

    return 1.0 + rho_s, mom_s, 1.0 + rho_o, mom_o


# transient budget per z-chunk: ~30 live f32 (cz, Y, X) temporaries during
# the moment computation, so 8M cells/chunk ≈ 1 GB transient HBM — small
# next to the resident DDFs.  The monolithic version OOM'd at 71M cells
# (18.7 G needed of 15.75 G: the wall-model quad section's unrolled decodes/
# rolls plus a full-lattice relayout copy).  Override for tests via
# LUW_UPDATE_CHUNK_CELLS.
_CHUNK_CELLS = 8_000_000

# The chunk loop is Python-unrolled inside jit, so program size (compile
# time + the remote-compile payload) scales with the chunk count; tall-thin
# grids with small planes would otherwise emit dozens of copies of the
# moment scan.  16 chunks keeps the per-chunk transient at ~the 8M-cell
# budget for the largest grid a single chip holds (~134M cells at 77 B).
_MAX_CHUNKS = 16


def _z_window(arr, z0: int, z1: int, Z: int, axis: int):
    """arr rows [z0-1, z1+1) along `axis` with MODULAR wrap, built from
    static slices only (no gather, no relayout copy): jnp.roll z-semantics
    are preserved exactly, including at the physical z extremes."""
    def sl(a, b):
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(a, b)
        return arr[tuple(idx)]

    parts = []
    if z0 - 1 < 0:
        parts.append(sl(Z - 1, Z))
    parts.append(sl(max(z0 - 1, 0), min(z1 + 1, Z)))
    if z1 + 1 > Z:
        parts.append(sl(0, 1))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=axis)


@partial(jax.jit, static_argnames=("config", "chunk_cells"))
def _update(state: LBMState, dyn: DynParams, config: StepConfig,
            chunk_cells: int) -> LBMState:
    # NOTE: fi/gi pass through unchanged and rho/u/T are updated by z-chunk,
    # so XLA aliases them; the transient cost is one chunk's working set.
    flags = state.flags
    Z, Y, X = flags.shape
    cz = max(1, min(Z, chunk_cells // max(1, Y * X)))
    cz = max(cz, -(-Z // _MAX_CHUNKS))   # floor: bound the unroll count
    if cz >= Z:
        starts = [0]
    else:
        # fixed-size chunks; the tail start overlaps (recompute, idempotent)
        starts = sorted({*range(0, Z - cz + 1, cz), Z - cz})

    fx = dyn.force.astype(jnp.float32)
    ox, oy, oz = dyn.omega_coriolis
    rho_new, u_new, T_new = state.rho, state.u, state.T

    # Chunks are data-independent in their INPUTS (each reads its own fi
    # window), so without an explicit ordering XLA's scheduler overlaps
    # them and the transient peak grows with the chunk COUNT instead of the
    # chunk size (measured: 71M cells, 8M-cell chunks -> 10.9 GB temp, and
    # shrinking the chunk didn't help).  Threading every chunk's inputs
    # through an optimization_barrier tied to the previous chunk's outputs
    # forces sequential execution, restoring the one-chunk transient bound.
    fi_cur, gi_cur = state.fi, state.gi

    for z0 in starts:
        z1 = min(z0 + cz, Z)
        n = z1 - z0
        cr = slice(1, 1 + n)      # window rows [z0-1, z1+1) -> crop [z0, z1)
        fl_c = flags[z0:z1]
        solid_w = (_z_window(flags, z0, z1, Z, 0) & TYPE_S) != 0
        solid_c = solid_w[cr]
        eqbc_c = (fl_c & TYPE_E) != 0
        fi_w = _z_window(fi_cur, z0, z1, Z, 1)

        if config.wall_sides:
            rho_s, mom_s, rho_own, mom_own = _stream_moments_sides(
                fi_w, solid_w, C19, OPP19, config.storage,
                config.wall_model)
        else:
            rho_s, mom_s, rho_own, mom_own = _stream_moments(
                fi_w, solid_w, C19, OPP19, config.storage,
                wall_model=config.wall_model)
        rho_s, rho_own = rho_s[cr], rho_own[cr]
        mom_s, mom_own = mom_s[:, cr], mom_own[:, cr]
        u_s = mom_s / rho_s

        F = jnp.stack([
            fx[0] - 2.0 * rho_s * (oy * u_s[2] - oz * u_s[1]),
            fx[1] - 2.0 * rho_s * (oz * u_s[0] - ox * u_s[2]),
            fx[2] - 2.0 * rho_s * (ox * u_s[1] - oy * u_s[0]),
        ])
        if config.wall_model:
            # Schumann wall stress half-step, matching the step tiers
            ga = ((~solid_w) & jnp.roll(solid_w, 1, 0))[cr].astype(jnp.float32)
            uh = jnp.sqrt(u_s[0] * u_s[0] + u_s[1] * u_s[1])
            cw = config.wall_cd * ga * rho_s * uh
            F = F - jnp.stack([cw * u_s[0], cw * u_s[1], jnp.zeros_like(cw)])
        if config.wall_sides and config.wall_cd_sides > 0.0:
            fl_w = ~solid_w
            gx = (fl_w & (jnp.roll(solid_w, 1, 2)
                          | jnp.roll(solid_w, -1, 2)))[cr].astype(jnp.float32)
            gy = (fl_w & (jnp.roll(solid_w, 1, 1)
                          | jnp.roll(solid_w, -1, 1)))[cr].astype(jnp.float32)
            ut_x = jnp.sqrt(u_s[1] * u_s[1] + u_s[2] * u_s[2])
            ut_y = jnp.sqrt(u_s[0] * u_s[0] + u_s[2] * u_s[2])
            cs_ = config.wall_cd_sides * rho_s
            cwx = cs_ * gx * ut_x
            cwy = cs_ * gy * ut_y
            F = F - jnp.stack([cwy * u_s[0], cwx * u_s[1],
                               cwx * u_s[2] + cwy * u_s[2]])

        if config.thermal and gi_cur is not None:
            tfix = (fl_c & TYPE_T) != 0
            gi_w = _z_window(gi_cur, z0, z1, Z, 1)
            Tg_s, _, Tg_o, _ = _stream_moments(
                gi_w, solid_w, C7, OPP7, config.storage)
            Tn = jnp.where(tfix, Tg_o[cr], Tg_s[cr])
            T_new = T_new.at[z0:z1].set(
                jnp.where(solid_c, state.T[z0:z1], Tn))
            F = F - fx[:, None, None, None] * (config.beta
                                               * (Tn - config.t_avg))

        u_f = jnp.clip(u_s + F * (0.5 / rho_s), -CS, CS)

        u_own = mom_own / rho_own
        rho_new = rho_new.at[z0:z1].set(
            jnp.where(solid_c, state.rho[z0:z1],
                      jnp.where(eqbc_c, rho_own, rho_s)))
        u_new = u_new.at[:, z0:z1].set(
            jnp.where(solid_c[None], state.u[:, z0:z1],
                      jnp.where(eqbc_c[None], u_own, u_f)))
        if len(starts) > 1:
            if gi_cur is not None:
                (fi_cur, gi_cur, rho_new, u_new, T_new) = (
                    jax.lax.optimization_barrier(
                        (fi_cur, gi_cur, rho_new, u_new, T_new)))
            else:
                fi_cur, rho_new, u_new = jax.lax.optimization_barrier(
                    (fi_cur, rho_new, u_new))
    return state._replace(rho=rho_new, u=u_new, T=T_new)


_update_donating = jax.jit(_update.__wrapped__,
                           static_argnames=("config", "chunk_cells"),
                           donate_argnums=(0,))


def update_fields(state: LBMState, config: StepConfig,
                  dyn: DynParams = None, *, donate: bool = False) -> LBMState:
    """Refresh rho/u[/T] from the DDFs (reference kernel.cpp:1938).

    `donate=True` donates the input state so fi/gi alias through and the old
    rho/u buffers are reused — halves the transient footprint on production
    grids.  Callers must rebind (the old state's buffers become invalid)."""
    import os

    if dyn is None:
        dyn = DynParams(force=jnp.zeros(3, jnp.float32),
                        omega_coriolis=jnp.zeros(3, jnp.float32))
    # read per call and passed as a static arg, so changing the env var
    # between calls retraces instead of silently reusing the old chunking
    budget = int(os.environ.get("LUW_UPDATE_CHUNK_CELLS", 0)) or _CHUNK_CELLS
    return (_update_donating if donate else _update)(state, dyn, config,
                                                     chunk_cells=budget)

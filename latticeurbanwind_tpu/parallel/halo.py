"""Sharded Pallas stepping: shard_map over any (Dx, Dy, Dz) split.

The GSPMD path (parallel/mesh.py) lets XLA infer halo collectives for the
jnp reference tier.  This module runs the *Pallas* kernel under shard_map —
the TPU analog of the reference's pack/PCIe/unpack halo pipeline
(reference: lbm.cpp:1864-1958), as explicit `lax.ppermute`s on ICI:

  * z split: each step ppermutes the single boundary plane of the cz=+1/-1
    DDF groups to the neighbor shards; the kernel's halo_mode consumes them
    through halo-extended arrays (no ghost layers needed — the kernel
    marches planes).
  * y / x splits: local arrays carry one GHOST row/lane layer on the split
    axes.  Each step ppermutes the boundary interior rows/lanes into the
    neighbors' ghosts (x first, then y including the x-ghost lanes, so
    corner values propagate — the reference serializes directions the same
    way, lbm.cpp:1910).  The kernel is ghost-oblivious: ghost outputs are
    garbage that the next exchange overwrites before anything reads them.
  * flags ghosts/halos are static — exchanged once per runner build.

Periodic wrap at the global box edge matches the reference's modular domain
indexing (lbm.cpp:1912).  The Von Karman inlet pre-step runs per shard with
its z offset and top-face ownership passed in (bc/vk_inlet.py ddf variant);
face nudge/sponge targets are static FaceBC slices, so no per-step gathers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..lbm.state import DynParams, Forcing, LBMState, StepConfig
from ..ops.stream_collide import (
    FaceBC, SplitState, build_face_bc, make_pallas_step, merge_state, split_state,
)


def _fwd(x, axis_name):
    """Receive the previous shard's data (wraps periodically)."""
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def _bwd(x, axis_name):
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i - 1) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def _pad_ghosts(a, gy: int, gx: int, axes=(-2, -1)):
    """Zero-pad ghost layers on the trailing (y, x) axes.

    `gy`/`gx` are the ghost WIDTHS (0 = no ghosts).  Width 1 is the normal
    halo; the y width grows to 16 when the local plane y-tiles, so the
    ghost-extended Y stays 32-aligned for the tiled kernel's block specs
    (only the innermost ghost row is ever exchanged or read — the rest are
    dead padding whose outputs nothing consumes).
    """
    if not (gy or gx):
        return a
    pad = [(0, 0)] * a.ndim
    if gy:
        pad[a.ndim + axes[0]] = (gy, gy)
    if gx:
        pad[a.ndim + axes[1]] = (gx, gx)
    return jnp.pad(a, pad)


def _strip_ghosts(a, gy: int, gx: int):
    if gy:
        a = a[..., gy:-gy, :]
    if gx:
        a = a[..., :, gx:-gx]
    return a


def _set_row(a, axis: int, index: int, row):
    """Replace one row/lane of `a` along `axis` (negative-safe) via concat."""
    n = a.shape[axis]
    i = index % n
    pre = jax.lax.slice_in_dim(a, 0, i, axis=axis)
    post = jax.lax.slice_in_dim(a, i + 1, n, axis=axis)
    return jnp.concatenate([pre, row, post], axis=axis)


def _exchange_ghosts(a, gy: int, gx: int):
    """Refresh the innermost ghost row/lane from the neighbors' boundary
    interiors.  x first, then y over the full (x-ghost-extended) width ->
    corners ok.  Interior spans [g, n-g); the kernel's unit-shift stencils
    only ever read ghost rows g-1 and n-g, so wider ghosts stay dead."""
    if gx:
        from_left = _fwd(a[..., -(gx + 1):-gx], "x")
        from_right = _bwd(a[..., gx:gx + 1], "x")
        if gx == 1:
            a = jnp.concatenate([from_left, a[..., 1:-1], from_right], axis=-1)
        else:
            a = _set_row(a, a.ndim - 1, gx - 1, from_left)
            a = _set_row(a, a.ndim - 1, a.shape[-1] - gx, from_right)
    if gy:
        from_south = _fwd(a[..., -(gy + 1):-gy, :], "y")
        from_north = _bwd(a[..., gy:gy + 1, :], "y")
        if gy == 1:
            a = jnp.concatenate([from_south, a[..., 1:-1, :], from_north],
                                axis=-2)
        else:
            a = _set_row(a, a.ndim - 2, gy - 1, from_south)
            a = _set_row(a, a.ndim - 2, a.shape[-2] - gy, from_north)
    return a


def ghost_widths(shape: Tuple[int, int, int],
                 split: Tuple[int, int, int],
                 thermal: bool = False,
                 heavy: bool = False) -> Tuple[int, int]:
    """(gy, gx) ghost widths for a (Dx, Dy, Dz) split of `shape`.

    Width 1 unless the ghost-extended local plane must y-tile AND Y+2 has no
    32-multiple divisor — then the y width grows to 16 so Yg = Y/Dy + 32
    keeps the tiled kernel's alignment (tile_plan).  `thermal`/`heavy` must
    match the StepConfig the kernel will build with — their reduced VMEM
    budgets can change which tilings legalize."""
    from ..ops.stream_collide import tile_plan

    Z, Y, X = shape
    dx, dy, dz = split
    gx = int(dx > 1)
    gy = int(dy > 1)
    if gy:
        xl = X // dx + 2 * gx
        if tile_plan(Y // dy + 2, xl, thermal=thermal,
                     heavy=heavy) is None and \
                tile_plan(Y // dy + 32, xl, thermal=thermal,
                          heavy=heavy) is not None:
            gy = 16
    return gy, gx


def local_shape_for(shape: Tuple[int, int, int],
                    split: Tuple[int, int, int],
                    thermal: bool = False,
                    heavy: bool = False) -> Tuple[int, int, int]:
    """Ghost-extended per-shard shape the pallas kernel will see."""
    Z, Y, X = shape
    dx, dy, dz = split
    gy, gx = ghost_widths(shape, split, thermal, heavy)
    return (Z // dz, Y // dy + 2 * gy, X // dx + 2 * gx)


def make_sharded_pallas_runner(config: StepConfig, forcing: Forcing,
                               shape: Tuple[int, int, int], mesh: Mesh,
                               *, n_inner: int = 1, pre_step=None,
                               init_u=None, init_T=None):
    """Jitted sharded `run(state, dyn, t0[, n]) -> state` using the Pallas
    kernel per subdomain.  `mesh` must have ('z','y','x') axes; each global
    dim must divide by its split.  `init_u`/`init_T` supply the static face-
    target values (defaults: taken from the state passed to the first call
    is NOT possible under jit — pass the initialized fields here).

    `pre_step(s, t, **shard_kw)` is the shard-aware DDF inlet hook
    (bc/vk_inlet.py `.ddf` variant); shard_kw carries the shard offsets
    (z0/y0/x0), local extents, ghost widths and face-ownership flags, so the
    inlet runs under ANY (Dx, Dy, Dz) split (the reference builds per-domain
    point buffers for the same purpose, setup.cpp:886-976).
    """
    Z, Y, X = shape
    nz, ny, nx = mesh.shape["z"], mesh.shape["y"], mesh.shape["x"]
    if Z % nz or Y % ny or X % nx:
        raise ValueError(f"grid {shape} not divisible by mesh ({nz},{ny},{nx})")
    from ..ops.stream_collide import config_budget_heavy

    zl, yl, xl = Z // nz, Y // ny, X // nx
    gy, gx = ghost_widths(shape, (nx, ny, nz), config.thermal,
                          config_budget_heavy(config))
    local_shape = (zl, yl + 2 * gy, xl + 2 * gx)
    _, Yg, Xg = local_shape
    thermal = config.thermal
    has_nudge = forcing.nudge_sigma is not None
    has_sponge = forcing.sponge_sigma_z is not None
    has_forcing = has_nudge or has_sponge

    # kernel closure keys presence off the Forcing arg; values are fed per
    # shard through forcing_loc.  Hand it local-shape placeholders.
    placeholder = Forcing(
        nudge_sigma=jnp.zeros(local_shape, jnp.float32) if has_nudge else None,
        nudge_face=jnp.zeros(local_shape, jnp.int8) if has_nudge else None,
        nudge_vertical=forcing.nudge_vertical,
        sponge_sigma_z=(jnp.zeros(zl, jnp.float32) if has_sponge else None),
    )
    # inlet kernel spec (bc/vk_inlet.py): sites compiled into the kernel,
    # global masks sliced per shard (ownership-scaled) through vk_loc
    vk_spec = getattr(pre_step, "kernel_spec", None) if pre_step else None
    if pre_step is not None and vk_spec is None:
        raise ValueError(
            "pre_step has no .kernel_spec — pass the VK ddf hook itself "
            "(bc/vk_inlet.py make_vk_pre_step(...).ddf), not a wrapper: the "
            "inlet equilibria are applied in-kernel from its site spec")
    step_local = make_pallas_step(config, placeholder, local_shape,
                                  halo_mode=True, vk=vk_spec,
                                  vk_offsets=(gy, gx))

    # global forcing arrays, sharded into the body (ghosts padded inside)
    nsig_g = (jnp.asarray(forcing.nudge_sigma, jnp.float32) if has_nudge
              else jnp.zeros((Z, Y, X), jnp.float32))
    nface_g = (jnp.asarray(forcing.nudge_face).astype(jnp.uint8) if has_nudge
               else jnp.zeros((Z, Y, X), jnp.uint8))
    spz_g = (jnp.asarray(forcing.sponge_sigma_z, jnp.float32).reshape(Z, 1)
             if has_sponge else jnp.zeros((Z, 1), jnp.float32))

    def exchange_state(s: SplitState) -> SplitState:
        if not (gy or gx):
            return s
        rep = {k: _exchange_ghosts(getattr(s, k), gy, gx)
               for k in ("f0", "fp", "fm")}
        if s.g0 is not None:
            rep.update({k: _exchange_ghosts(getattr(s, k), gy, gx)
                        for k in ("g0", "gp", "gm")})
        if s.rows_lo is not None and gx:
            # carried rows span the full local X incl. ghost lanes; refresh
            # their boundary lane from the x-neighbor (y-ghost rows never
            # coincide with tile-boundary rows since ghost width < By)
            rep["rows_lo"] = _exchange_ghosts(s.rows_lo, 0, gx)
            rep["rows_hi"] = _exchange_ghosts(s.rows_hi, 0, gx)
        return s._replace(**rep)

    def z_halos(s: SplitState) -> dict:
        halos = dict(
            fp_halo=_fwd(s.fp[:, -1:], "z"),      # cz=+1 pulls from z-1
            fm_halo=_bwd(s.fm[:, :1], "z"),       # cz=-1 pulls from z+1
        )
        if s.gp is not None:
            halos["gp_halo"] = _fwd(s.gp[:, -1:], "z")
            halos["gm_halo"] = _bwd(s.gm[:, :1], "z")
        if s.rows_lo is not None:
            halos["rlo_hb"] = _fwd(s.rows_lo[:, -1:], "z")
            halos["rlo_ha"] = _bwd(s.rows_lo[:, :1], "z")
            halos["rhi_hb"] = _fwd(s.rows_hi[:, -1:], "z")
            halos["rhi_ha"] = _bwd(s.rows_hi[:, :1], "z")
        return halos

    def body(state: LBMState, dyn: DynParams, t0, n_steps,
             nsig, nface, spz, fbc: Optional[FaceBC]
             ) -> Tuple[LBMState, Optional[FaceBC]]:
        s = split_state(state)
        # ghost-extend the local DDF/flag arrays (loop-carried)
        s = s._replace(
            f0=_pad_ghosts(s.f0, gy, gx), fp=_pad_ghosts(s.fp, gy, gx),
            fm=_pad_ghosts(s.fm, gy, gx),
            flags=_pad_ghosts(s.flags, gy, gx),
            g0=None if s.g0 is None else _pad_ghosts(s.g0, gy, gx),
            gp=None if s.gp is None else _pad_ghosts(s.gp, gy, gx),
            gm=None if s.gm is None else _pad_ghosts(s.gm, gy, gx),
            T=None if s.T is None else _pad_ghosts(s.T, gy, gx),
            fbc=fbc,
        )
        # flags ghosts/halos are static: exchange once
        flags_g = _exchange_ghosts(s.flags, gy, gx)
        s = s._replace(flags=flags_g)
        flb = _fwd(flags_g[-1:], "z")
        fla = _bwd(flags_g[:1], "z")
        if step_local.uses_rows:   # y-tiled local planes: seed carried rows
            rl, rh = step_local.init_rows(s)
            s = s._replace(rows_lo=rl, rows_hi=rh)

        fl_loc = {}
        if has_forcing:
            fl_loc["sponge_z"] = spz
            if has_nudge:
                fl_loc["nudge_sigma"] = _pad_ghosts(nsig, gy, gx)
                fl_loc["nudge_face"] = _pad_ghosts(nface, gy, gx)

        zi = jax.lax.axis_index("z")
        yi = jax.lax.axis_index("y")
        xi = jax.lax.axis_index("x")
        # shard geometry for the inlet hook: offsets, local extents, ghost
        # widths, and face ownership (which shard holds each physical face)
        shard_kw = dict(
            z0=zi * zl, zl=zl, y0=yi * yl, yl=yl, x0=xi * xl, xl=xl,
            gy=gy, gx=gx,
            top_on=(zi == nz - 1).astype(jnp.float32),
            west_on=(xi == 0).astype(jnp.float32),
            east_on=(xi == nx - 1).astype(jnp.float32),
            south_on=(yi == 0).astype(jnp.float32),
            north_on=(yi == ny - 1).astype(jnp.float32),
        )

        def _slice_pad(a, axis, start, length, g):
            """a[start : start+length] along `axis`, zero-padded g wide on
            each side (lines up with the ghost-extended local arrays; ghost
            mask entries stay zero, so inlet blends never touch ghosts)."""
            out = jax.lax.dynamic_slice_in_dim(a, start, length, axis)
            if g:
                pad = [(0, 0)] * a.ndim
                pad[axis] = (g, g)
                out = jnp.pad(out, pad)
            return out

        vk_loc = None
        if vk_spec:
            own_scal = {
                "lane0": shard_kw["west_on"], "laneL": shard_kw["east_on"],
                "row0": shard_kw["south_on"], "rowL": shard_kw["north_on"],
                "planeL": shard_kw["top_on"],
                "plane0": (zi == 0).astype(jnp.float32),
            }
            vk_loc = {}
            for kind, field in vk_spec["sites"]:
                m = vk_spec["masks"][field]
                if kind in ("lane0", "laneL"):        # (Z, 1, Y)
                    ml = _slice_pad(m, 0, shard_kw["z0"], zl, 0)
                    ml = _slice_pad(ml, 2, shard_kw["y0"], yl, gy)
                elif kind in ("row0", "rowL"):        # (Z, 1, X)
                    ml = _slice_pad(m, 0, shard_kw["z0"], zl, 0)
                    ml = _slice_pad(ml, 2, shard_kw["x0"], xl, gx)
                else:                                 # (Y, X)
                    ml = _slice_pad(m, 0, shard_kw["y0"], yl, gy)
                    ml = _slice_pad(ml, 1, shard_kw["x0"], xl, gx)
                vk_loc[field] = ml * own_scal[kind]

        t0_ = jnp.asarray(t0, jnp.int32)
        if pre_step is not None and hasattr(pre_step, "init_aux"):
            s = s._replace(aux=pre_step.init_aux(s, t0_))

        def inner(i, st):
            if pre_step is not None:
                # PRE-step: the hook refreshes the FaceBC targets; the
                # kernel's in-kernel inlet sites then emit feq(realization
                # at t0+i), streamed by neighbors during the next step —
                # reference timing (see lbm/stepper.py loop docstring)
                st = pre_step(st, t0_ + i, **shard_kw)
            st = exchange_state(st)
            halos = z_halos(st)
            st = step_local(st, dyn, flb_halo=flb, fla_halo=fla,
                            forcing_loc=fl_loc, vk_loc=vk_loc, **halos)
            return st

        out = jax.lax.fori_loop(0, n_steps, inner, s)
        fbc_out = out.fbc
        out = out._replace(
            f0=_strip_ghosts(out.f0, gy, gx), fp=_strip_ghosts(out.fp, gy, gx),
            fm=_strip_ghosts(out.fm, gy, gx), flags=state.flags, fbc=None,
            T=state.T,
            g0=None if out.g0 is None else _strip_ghosts(out.g0, gy, gx),
            gp=None if out.gp is None else _strip_ghosts(out.gp, gy, gx),
            gm=None if out.gm is None else _strip_ghosts(out.gm, gy, gx),
        )
        return merge_state(out), fbc_out

    spec_v = P(None, "z", "y", "x")
    spec_s = P("z", "y", "x")
    from jax.experimental.shard_map import shard_map

    in_state_specs = LBMState(
        fi=spec_v, rho=spec_s, u=spec_v, flags=spec_s,
        gi=spec_v if thermal else None, T=spec_s if thermal else None)
    # face targets: ut/ub/tt replicated over z (they are global top/bottom
    # planes every shard needs); z-extended faces shard over z and their row
    # axis; ghost columns/rows on sharded axes are padded inside the body...
    # targets at ghost cells are never used (nudge sigma is zero there), so
    # edge-padding via the kernel-side slices is unnecessary — instead the
    # fbc arrays are ghost-padded here with edge values.
    fbc_specs = FaceBC(
        uw=P("z", None, "y"), ue=P("z", None, "y"),
        us=P("z", None, "x"), un=P("z", None, "x"),
        ut=P(None, "y", "x"), ub=P(None, "y", "x"),
        tt=P("y", "x") if thermal else None,
    )
    smapped = shard_map(
        body, mesh=mesh,
        in_specs=(in_state_specs, P(), P(), P(), spec_s, spec_s,
                  P("z", None), fbc_specs),
        out_specs=(in_state_specs, fbc_specs),
        check_rep=False,
    )

    def body_padded(state, dyn, t0, n_steps, nsig, nface, spz, fbc):
        return smapped(state, dyn, t0, n_steps, nsig, nface, spz, fbc)

    jitted = jax.jit(body_padded, donate_argnums=(0,))

    # static face targets from the initialized boundary fields, ghost-padded
    # on sharded axes so local slices line up with the kernel's plane dims
    if init_u is None:
        raise ValueError("make_sharded_pallas_runner requires init_u (the "
                         "initialized velocity field) for the face targets")
    if thermal and init_T is None:
        raise ValueError("make_sharded_pallas_runner requires init_T for a "
                         "thermal config (the sponge temperature target)")
    u0 = jnp.asarray(init_u)
    T0 = jnp.asarray(init_T) if thermal else None
    fbc0 = build_face_bc(u0, T0)

    def pad_axis(a, axis, n_split, width):
        if n_split <= 1 or width == 0:
            return a
        # replicate the shard-edge values into ghosts: pad each SHARD slice.
        # Implemented by reshaping to (n_split, local) and edge-padding.
        moved = jnp.moveaxis(a, axis, 0)
        n = moved.shape[0]
        loc = n // n_split
        parts = moved.reshape(n_split, loc, *moved.shape[1:])
        parts = jnp.pad(parts,
                        [(0, 0), (width, width)] + [(0, 0)] * (parts.ndim - 2),
                        mode="edge")
        out = parts.reshape(n_split * (loc + 2 * width), *moved.shape[1:])
        return jnp.moveaxis(out, 0, axis)

    fbc0 = FaceBC(
        uw=pad_axis(fbc0.uw, 2, ny, gy), ue=pad_axis(fbc0.ue, 2, ny, gy),
        us=pad_axis(fbc0.us, 2, nx, gx), un=pad_axis(fbc0.un, 2, nx, gx),
        ut=pad_axis(pad_axis(fbc0.ut, 1, ny, gy), 2, nx, gx),
        ub=pad_axis(pad_axis(fbc0.ub, 1, ny, gy), 2, nx, gx),
        tt=None if fbc0.tt is None else pad_axis(
            pad_axis(fbc0.tt, 0, ny, gy), 1, nx, gx),
    )
    # the FaceBC is loop- AND chunk-carried: VK refreshes it in-loop and the
    # carried value persists across run() calls (never reverts to init)
    fbc_cell = [fbc0]

    def run(state: LBMState, dyn: DynParams, t0, n_steps=None) -> LBMState:
        n = jnp.asarray(n_inner if n_steps is None else n_steps, jnp.int32)
        out, fbc_cell[0] = jitted(state, dyn, jnp.asarray(t0, jnp.int32), n,
                                  nsig_g, nface_g, spz_g, fbc_cell[0])
        return out

    # checkpoint/resume access to the carried targets (run/checkpoint.py)
    run.get_fbc = lambda: fbc_cell[0]

    def set_fbc(fbc):
        faces = ("uw", "ue", "us", "un", "ut", "ub", "tt")
        for k in faces:
            mine = getattr(fbc_cell[0], k)
            theirs = getattr(fbc, k)
            if (mine is None) != (theirs is None):
                raise ValueError(f"restored FaceBC {k} presence does not "
                                 "match this runner (thermal mismatch?)")
            if mine is not None and theirs.shape != mine.shape:
                raise ValueError("restored FaceBC shapes do not match this mesh")
        fbc_cell[0] = fbc

    run.set_fbc = set_fbc
    run.fields_stale = True
    return run

"""Offscreen 3-D rendering: raytraced flag surfaces, Q-criterion isosurfaces,
and integrated streamlines — the framework's analog of the reference's
OpenCL graphics kernels (reference: kernel.cpp:2642-3200 raytrace_graphics /
graphics_streamline / graphics_q, host camera in graphics.cpp).

Design: a vectorized ray-marcher over the voxel grid (numpy; every ray steps
in lock-step with an active mask, ~0.7 cells per step).  The camera is
orthographic with azimuth/elevation/zoom — the reference's default view is
an isometric-ish perspective; orthographic keeps the math exact for the
same visual purpose (geometry + vortex inspection frames per event step).
Surface normals come from the gradient of a box-smoothed occupancy field;
shading is Lambertian + depth fog.  Streamlines integrate midpoint-RK2
through the velocity field from a seed grid and project through the same
camera, painted by local speed, occluded by the depth buffer.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


@dataclass(frozen=True)
class Camera:
    """Camera: azimuth/elevation in degrees, image size.

    fov = 0 gives the orthographic projection; fov > 0 (degrees, horizontal)
    switches to a perspective pinhole at the distance where the grid's
    bounding sphere fills the field of view — the reference's default
    interactive camera (graphics.cpp set_camera, fov 100 clamped <180)."""

    azimuth: float = 225.0       # degrees from +x toward +y
    elevation: float = 35.0      # degrees above the horizon
    width: int = 960
    height: int = 720
    zoom: float = 1.0
    fov: float = 0.0             # 0 = orthographic; else horizontal degrees

    def basis(self):
        az = np.radians(self.azimuth)
        el = np.radians(self.elevation)
        # view direction (pointing INTO the scene)
        d = -np.array([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                       np.sin(el)])
        right = np.array([-np.sin(az), np.cos(az), 0.0])
        up = np.cross(right, d)
        up /= np.linalg.norm(up)
        return d, right, up

    def eye(self, shape):
        """Perspective eye point: back along -d so the bounding sphere of
        the grid spans the horizontal FOV at zoom 1."""
        Z, Y, X = shape
        center = np.array([X / 2.0, Y / 2.0, Z / 2.0])
        diag = float(np.linalg.norm([X, Y, Z]))
        d, _, _ = self.basis()
        dist = (diag / 2.0) / np.tan(np.radians(min(self.fov, 179.0)) / 2.0)
        return center - d * (dist / self.zoom + diag / 2.0)


def _smooth_occupancy(mask: np.ndarray) -> np.ndarray:
    """3-wide box blur of the binary mask (for surface normals)."""
    occ = mask.astype(np.float32)
    for axis in range(3):
        occ = (np.roll(occ, 1, axis) + occ + np.roll(occ, -1, axis)) / 3.0
    return occ


def _camera_rays(shape, cam: Camera):
    """(origins (N,3), dirs (3,) or (N,3), extent) pixel-ray setup.

    Orthographic (fov=0): parallel rays, shared direction.  Perspective:
    every pixel's ray fans out from the eye point (per-ray directions)."""
    Z, Y, X = shape
    d, right, up = cam.basis()
    center = np.array([X / 2.0, Y / 2.0, Z / 2.0])
    diag = float(np.linalg.norm([X, Y, Z]))
    if cam.fov > 0.0:
        eye = cam.eye(shape)
        f = 0.5 / np.tan(np.radians(min(cam.fov, 179.0)) / 2.0)
        xs = np.linspace(-0.5, 0.5, cam.width) * (cam.width / cam.height)
        ys = np.linspace(0.5, -0.5, cam.height)
        px, py = np.meshgrid(xs, ys)
        dirs = (d[None, :] * f + px.reshape(-1, 1) * right[None, :]
                + py.reshape(-1, 1) * up[None, :])
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        origins = np.broadcast_to(eye, dirs.shape).copy()
        return origins.astype(np.float32), dirs.astype(np.float32), diag
    # fit the grid's bounding sphere into the image
    span = diag / cam.zoom
    xs = np.linspace(-0.5, 0.5, cam.width) * span * (cam.width / cam.height)
    ys = np.linspace(0.5, -0.5, cam.height) * span
    px, py = np.meshgrid(xs, ys)
    origins = (center[None, :] - d[None, :] * diag
               + px.reshape(-1, 1) * right[None, :]
               + py.reshape(-1, 1) * up[None, :])
    return origins.astype(np.float32), d.astype(np.float32), diag


def _march(mask: np.ndarray, origins, d, length, *, step: float = 0.7):
    """First-hit ray march: returns (hit (N,), t_hit (N,), pos (N,3)).

    `d` is one shared direction (3,) for orthographic rays or per-ray
    directions (N, 3) for perspective.  Rays fast-forward to their grid-bbox
    entry (slab test) and die at exit, so the cost is proportional to the
    in-grid path only."""
    Z, Y, X = mask.shape
    n = len(origins)
    per_ray = np.ndim(d) == 2
    dv = d if per_ray else d[None, :]
    dims = np.array([X, Y, Z], np.float32)
    # slab test: t range where the ray is inside [0, dim-1] on every axis
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(np.abs(dv) > 1e-12, 1.0 / dv, np.inf)
        t0 = (0.0 - origins) * inv
        t1 = (dims[None, :] - 1.0 - origins) * inv
    t_lo = np.minimum(t0, t1).max(axis=1)
    t_hi = np.maximum(t0, t1).min(axis=1)
    t = np.maximum(t_lo, 0.0).astype(np.float32)
    active = t_hi > t_lo
    hit = np.zeros(n, bool)
    pos = origins + t[:, None] * dv
    n_steps = int(np.nanmax(np.where(active, t_hi - t, 0.0)) / step) + 2
    idx_cap = np.array([X - 1, Y - 1, Z - 1])
    for _ in range(n_steps):
        act_idx = np.nonzero(active)[0]
        if not len(act_idx):
            break
        p = pos[act_idx]
        idx = np.clip(np.round(p).astype(np.int64), 0, idx_cap)
        occ = mask[idx[:, 2], idx[:, 1], idx[:, 0]]
        newly = act_idx[occ]
        hit[newly] = True
        active[newly] = False
        done = act_idx[t[act_idx] > t_hi[act_idx]]
        active[done] = False
        pos[active] += (dv[active] if per_ray else d) * step
        t[active] += step
    return hit, t, pos


def _shade(mask: np.ndarray, hit, t, pos, diag, base_rgb,
           light=(0.5, -0.3, 0.8)):
    """Lambert + depth-fog RGB for hit rays; returns (N, 3) and depth (N,)."""
    occ = _smooth_occupancy(mask)
    Z, Y, X = mask.shape
    p = np.clip(np.round(pos[hit]).astype(np.int64), 1,
                [X - 2, Y - 2, Z - 2])
    gx = occ[p[:, 2], p[:, 1], p[:, 0] + 1] - occ[p[:, 2], p[:, 1], p[:, 0] - 1]
    gy = occ[p[:, 2], p[:, 1] + 1, p[:, 0]] - occ[p[:, 2], p[:, 1] - 1, p[:, 0]]
    gz = occ[p[:, 2] + 1, p[:, 1], p[:, 0]] - occ[p[:, 2] - 1, p[:, 1], p[:, 0]]
    n = np.stack([gx, gy, gz], axis=1)
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    n = -n / np.maximum(norm, 1e-6)
    lv = np.asarray(light, np.float32)
    lv = lv / np.linalg.norm(lv)
    lam = np.clip(n @ lv, 0.0, 1.0) * 0.75 + 0.25
    fog = np.clip(1.0 - 0.25 * (t[hit] / (2 * diag)), 0.0, 1.0)
    rgb = np.asarray(base_rgb, np.float32)[None, :] * (lam * fog)[:, None]
    return rgb


def raytrace_masks(shape, layers, cam: Camera, background=(1.0, 1.0, 1.0)):
    """Composite first-hit render of mask layers [(mask, rgb), ...]; earlier
    layers occlude later ones only by depth.  Returns (H, W, 3) float RGB
    and the (H, W) depth buffer (inf where no hit)."""
    origins, d, diag = _camera_rays(shape, cam)
    npix = len(origins)
    img = np.tile(np.asarray(background, np.float32), (npix, 1))
    depth = np.full(npix, np.inf, np.float32)
    for mask, rgb in layers:
        if not mask.any():
            continue
        hit, t, pos = _march(mask, origins, d, diag)
        if not hit.any():
            continue
        shaded = _shade(mask, hit, t, pos, diag, rgb)
        closer = np.zeros(npix, bool)
        closer[hit] = t[hit] < depth[hit]
        sel = closer[hit]
        img[closer] = shaded[sel]
        depth[closer] = t[closer]
    return (img.reshape(cam.height, cam.width, 3),
            depth.reshape(cam.height, cam.width))


def integrate_streamlines(u: np.ndarray, seeds: np.ndarray, *,
                          n_steps: int = 250, dt: float = 0.8,
                          solid: Optional[np.ndarray] = None):
    """Midpoint-RK2 streamlines through u (3, Z, Y, X) from seeds (N, 3)
    given as (x, y, z).  Returns (paths (S+1, N, 3), speeds (S+1, N));
    NaN past domain exit (reference graphics_streamline, kernel.cpp:2872)."""
    Z, Y, X = u.shape[1:]
    dims = np.array([X, Y, Z], np.float32)

    def vel_at(p):
        idx = np.clip(np.round(p).astype(np.int64), 0, [X - 1, Y - 1, Z - 1])
        v = u[:, idx[:, 2], idx[:, 1], idx[:, 0]].T
        return v.astype(np.float32)

    p = seeds.astype(np.float32).copy()
    alive = np.ones(len(seeds), bool)
    paths = [p.copy()]
    speeds = [np.linalg.norm(vel_at(p), axis=1)]
    for _ in range(n_steps):
        v1 = vel_at(p)
        sp = np.linalg.norm(v1, axis=1, keepdims=True)
        step1 = v1 / np.maximum(sp, 1e-9) * dt
        v2 = vel_at(p + 0.5 * step1)
        sp2 = np.linalg.norm(v2, axis=1, keepdims=True)
        p_new = p + v2 / np.maximum(sp2, 1e-9) * dt
        inside = ((p_new >= 0) & (p_new <= dims - 1)).all(axis=1)
        if solid is not None:
            idx = np.clip(np.round(p_new).astype(np.int64), 0,
                          [X - 1, Y - 1, Z - 1])
            inside &= ~solid[idx[:, 2], idx[:, 1], idx[:, 0]]
        alive &= inside & (sp[:, 0] > 1e-9)
        p = np.where(alive[:, None], p_new, p)
        rec = p.copy()
        rec[~alive] = np.nan
        paths.append(rec)
        speeds.append(np.where(alive, np.linalg.norm(vel_at(p), axis=1), np.nan))
    return np.stack(paths), np.stack(speeds)


def default_seeds(shape, solid: Optional[np.ndarray], *, n: int = 24):
    """Seed grid on the west inflow face, clear of solids."""
    Z, Y, X = shape
    ys = np.linspace(2, Y - 3, max(2, int(np.sqrt(n) * Y / max(Y, Z))))
    zs = np.linspace(2, Z - 3, max(2, n // max(2, len(ys))))
    gy, gz = np.meshgrid(ys, zs)
    seeds = np.stack([np.full(gy.size, 1.5), gy.ravel(), gz.ravel()], axis=1)
    if solid is not None:
        idx = np.clip(np.round(seeds).astype(np.int64), 0, [X - 1, Y - 1, Z - 1])
        seeds = seeds[~solid[idx[:, 2], idx[:, 1], idx[:, 0]]]
    return seeds


def project_points(points, shape, cam: Camera):
    """World (x, y, z) -> image (col, row, t) through the same camera."""
    Z, Y, X = shape
    d, right, up = cam.basis()
    center = np.array([X / 2.0, Y / 2.0, Z / 2.0])
    diag = float(np.linalg.norm([X, Y, Z]))
    if cam.fov > 0.0:
        f = 0.5 / np.tan(np.radians(min(cam.fov, 179.0)) / 2.0)
        rel = points - cam.eye(shape)[None, :]
        depth = rel @ d                   # along the view axis (projection)
        safe = np.maximum(depth, 1e-6)
        px = (rel @ right) * f / safe
        py = (rel @ up) * f / safe
        col = (px / (cam.width / cam.height) + 0.5) * (cam.width - 1)
        row = (0.5 - py) * (cam.height - 1)
        # t = distance from the eye along the ray — comparable with the
        # march's depth buffer (per-ray unit directions)
        t = np.linalg.norm(rel, axis=1) * np.sign(depth)
        return col, row, t
    span = diag / cam.zoom
    rel = points - center[None, :]
    px = rel @ right
    py = rel @ up
    t = rel @ d + diag      # distance along the ray from the image plane
    col = (px / (span * cam.width / cam.height) + 0.5) * (cam.width - 1)
    row = (0.5 - py / span) * (cam.height - 1)
    return col, row, t


def render_scene(flags_solid: np.ndarray, u: Optional[np.ndarray],
                 out_path: Path, *, q: Optional[np.ndarray] = None,
                 q_threshold: Optional[float] = None,
                 cam: Optional[Camera] = None, title: str = "",
                 streamlines: bool = True, u_factor: float = 1.0,
                 max_cells: int = 8_000_000,
                 volume: Optional[Tuple[np.ndarray, str]] = None,
                 slice_spec: Optional[Tuple[int, int, np.ndarray, str]] = None,
                 t_avg: float = 0.0, opacity_gain: float = 1.0,
                 field_scale: Optional[float] = None,
                 force_field: Optional[np.ndarray] = None,
                 force_scale: Optional[float] = None,
                 max_force_vectors: int = 2000) -> Path:
    """One composite 3-D frame: raytraced solid geometry, optional
    Q-criterion isosurface, and velocity streamlines (reference snapshot
    set, setup.cpp:4843-4861).

    Grids above `max_cells` stride-decimate before marching: the numpy
    marcher's cost is rays x in-grid path, so a 100M-cell grid would take
    minutes per frame while stride 3 renders visually-identical geometry in
    seconds (the reference renders in-device, kernel.cpp:2642-3200 — CPU
    frames must shrink the problem instead).

    `volume=(scalar, mode)` overlays the VIS_FIELD volumetric raycast
    (graphics_field_rt, kernel.cpp:2864) of the scalar field (mode 'u'/
    'rho'/'T' selects weight + colorscale); `slice_spec=(axis, index,
    scalar, mode)` embeds a colored slice plane depth-tested against the
    geometry (graphics_field_slice, kernel.cpp:2890); `force_field`
    (3, Z, Y, X) draws iron-colored per-boundary force vectors from solid
    surface cells (graphics_flags FORCE_FIELD branch, kernel.cpp:2698)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.collections import LineCollection

    cam = cam or Camera()
    cells = int(np.prod(flags_solid.shape))
    vol_scalar, vol_mode = volume if volume is not None else (None, "u")
    sl_axis, sl_index, sl_scalar, sl_mode = (
        slice_spec if slice_spec is not None else (0, 0, None, "u"))
    if cells > max_cells:
        s = int(np.ceil((cells / max_cells) ** (1.0 / 3.0)))
        flags_solid = flags_solid[::s, ::s, ::s]
        u = u[:, ::s, ::s, ::s] if u is not None else None
        q = q[::s, ::s, ::s] if q is not None else None
        if vol_scalar is not None:
            vol_scalar = vol_scalar[::s, ::s, ::s]
        if sl_scalar is not None:
            sl_scalar = sl_scalar[::s, ::s, ::s]
            sl_index //= s
        if force_field is not None:
            force_field = force_field[:, ::s, ::s, ::s]
    shape = flags_solid.shape
    layers = [(flags_solid, (0.55, 0.55, 0.6))]
    if q is not None and q_threshold is not None:
        q_mask = (q > q_threshold) & ~flags_solid
        layers.append((q_mask, (0.85, 0.3, 0.15)))
    img, depth = raytrace_masks(shape, layers, cam)

    if sl_scalar is not None or vol_scalar is not None:
        from .fieldvis import raycast_field, slice_plane

        origins, rays_d, _ = _camera_rays(shape, cam)
        flat_img = img.reshape(-1, 3)
        flat_depth = depth.reshape(-1)
        if sl_scalar is not None:
            sl_index = min(max(sl_index, 0), shape[sl_axis] - 1)
            hit, t_sl, rgb_sl = slice_plane(
                sl_scalar, sl_axis, sl_index, origins, rays_d,
                mode=sl_mode, scale=field_scale, t_avg=t_avg,
                exclude=flags_solid)
            vis = hit & (t_sl < flat_depth)
            flat_img[vis] = rgb_sl[vis]
            flat_depth[vis] = t_sl[vis]
        if vol_scalar is not None:
            rgb_v, alpha = raycast_field(
                vol_scalar, origins, rays_d, mode=vol_mode,
                scale=field_scale, t_avg=t_avg, exclude=flags_solid,
                opacity_gain=opacity_gain, geom_depth=flat_depth)
            flat_img[:] = (rgb_v * alpha[:, None]
                           + flat_img * (1.0 - alpha[:, None]))
        img = flat_img.reshape(cam.height, cam.width, 3)
        depth = flat_depth.reshape(cam.height, cam.width)

    fig, ax = plt.subplots(figsize=(cam.width / 100, cam.height / 100))
    ax.imshow(np.clip(img, 0, 1))
    if streamlines and u is not None:
        seeds = default_seeds(shape, flags_solid)
        if len(seeds):
            paths, speeds = integrate_streamlines(u, seeds, solid=flags_solid)
            col, row, t = project_points(paths.reshape(-1, 3), shape, cam)
            col = col.reshape(paths.shape[:2])
            row = row.reshape(paths.shape[:2])
            t = t.reshape(paths.shape[:2])
            vmax = np.nanmax(speeds) * u_factor + 1e-12
            cmap = plt.get_cmap("turbo")
            segs, colors = [], []
            for s in range(len(seeds)):
                c, r, tt, sp = col[:, s], row[:, s], t[:, s], speeds[:, s]
                ok = np.isfinite(c) & np.isfinite(r)
                # hidden-line test against the geometry depth buffer
                ci = np.clip(np.nan_to_num(c).astype(np.int64), 0, cam.width - 1)
                ri = np.clip(np.nan_to_num(r).astype(np.int64), 0, cam.height - 1)
                vis = ok & (tt <= depth[ri, ci] + 1.0)
                pts = np.stack([c, r], axis=1)
                for k in range(len(pts) - 1):
                    if vis[k] and vis[k + 1]:
                        segs.append([pts[k], pts[k + 1]])
                        colors.append(cmap(min(sp[k] * u_factor / vmax, 1.0)))
            if segs:
                ax.add_collection(LineCollection(segs, colors=colors,
                                                 linewidths=1.0))
    if force_field is not None:
        # iron-colored per-boundary force vectors from solid cells
        # (reference graphics_flags FORCE_FIELD branch, kernel.cpp:2698)
        from .fieldvis import colorscale_iron

        fmag = np.sqrt((force_field ** 2).sum(axis=0))
        zi, yi, xi = np.nonzero(fmag > 0)
        if len(zi):
            if len(zi) > max_force_vectors:
                pick = np.linspace(0, len(zi) - 1, max_force_vectors,
                                   dtype=np.int64)
                zi, yi, xi = zi[pick], yi[pick], xi[pick]
            mags = fmag[zi, yi, xi]
            fs = (force_scale if force_scale is not None
                  else 3.0 / max(float(mags.max()), 1e-12))
            p0 = np.stack([xi, yi, zi], axis=1).astype(np.float32)
            vec = force_field[:, zi, yi, xi].T * fs
            p1 = p0 + vec
            c0, r0, t0 = project_points(p0, shape, cam)
            c1, r1, t1 = project_points(p1, shape, cam)
            ci = np.clip(c0.astype(np.int64), 0, cam.width - 1)
            ri = np.clip(r0.astype(np.int64), 0, cam.height - 1)
            vis = t0 <= depth[ri, ci] + 1.5
            rgba = colorscale_iron(mags * fs / 3.0)
            fsegs = [[(c0[i], r0[i]), (c1[i], r1[i])]
                     for i in np.nonzero(vis)[0]]
            fcols = [tuple(rgba[i]) + (1.0,) for i in np.nonzero(vis)[0]]
            if fsegs:
                ax.add_collection(LineCollection(fsegs, colors=fcols,
                                                 linewidths=1.2))
    ax.set_axis_off()
    if title:
        ax.set_title(title)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return out_path

"""luwtkeviz — multi-altitude wind-quiver and TKE-heatmap figures.

Analog of the reference tke_viz.py / batch_tke_geo_viz.py (tools_core):
reads an averaged legacy VTK, picks target-height layers via the fixed
height(m) = base + step*z mapping (reference tke_viz.py:14-16 uses
-50 + 10*z), and renders a 3x3 panel grid per product:

  * wind: speed imshow (turbo) + arrow quiver on each XY layer
    (reference plot_wind_figure, tke_viz.py:946-1081)
  * tke: heatmap per layer (reference plot_tke_figure, tke_viz.py:1083+)

Modes:
  * file mode:  luwtkeviz <avg.vtk> [options]
  * batch mode: luwtkeviz --deck conf.luw — iterates every `*_avg-*.vtk`
    under RESULTS/vtk (the batch_tke_geo_viz analog; geospatial reprojection
    is replaced by the case's local metric frame, with lon/lat axis labels
    when proj_temp/transform.info exists).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import List, Optional

import numpy as np

TARGET_HEIGHTS_M = [50, 100, 150, 200, 300, 400, 500, 600, 800]


def _layers(Z: int, heights: List[float], base: float, step: float):
    plan = []
    for h in heights:
        z = int(round((h - base) / step))
        if 0 <= z < Z:
            plan.append((h, z))
    return plan


def _grid_3x3(fig):
    return [fig.add_subplot(3, 3, i + 1) for i in range(9)]


def render_wind_layers(u, out_path: Path, plan, *, spacing=1.0, origin=(0.0, 0.0),
                       quiver_step: int = 0, title: str = "") -> Path:
    """u: (3, Z, Y, X) SI velocity."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.colors import Normalize

    _, Z, Y, X = u.shape
    step = quiver_step or max(1, max(Y, X) // 24)
    speed_all = np.sqrt((u ** 2).sum(axis=0))
    norm = Normalize(0.0, max(float(np.nanpercentile(speed_all, 99.5)), 1e-6))
    ext = (origin[0], origin[0] + X * spacing, origin[1], origin[1] + Y * spacing)
    xs = origin[0] + (np.arange(0, X, step) + 0.5) * spacing
    ys = origin[1] + (np.arange(0, Y, step) + 0.5) * spacing
    fig = plt.figure(figsize=(15, 13))
    axes = _grid_3x3(fig)
    im = None
    for ax, (h, z) in zip(axes, plan):
        sp = speed_all[z]
        im = ax.imshow(sp, origin="lower", extent=ext, cmap="turbo",
                       norm=norm, aspect="equal")
        ax.quiver(xs, ys, u[0, z, ::step, ::step], u[1, z, ::step, ::step],
                  color="white", scale_units="xy", width=0.003)
        ax.set_title(f"h = {h:g} m (z={z})", fontsize=10)
    for ax in axes[len(plan):]:
        ax.axis("off")
    if im is not None:
        fig.colorbar(im, ax=axes, shrink=0.8, label="|u| (m/s)")
    fig.suptitle(title or "wind layers")
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return out_path


def render_tke_layers(tke, out_path: Path, plan, *, spacing=1.0,
                      origin=(0.0, 0.0), title: str = "") -> Path:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.colors import Normalize

    Z, Y, X = tke.shape
    norm = Normalize(0.0, max(float(np.nanpercentile(tke, 99.5)), 1e-9))
    ext = (origin[0], origin[0] + X * spacing, origin[1], origin[1] + Y * spacing)
    fig = plt.figure(figsize=(15, 13))
    axes = _grid_3x3(fig)
    im = None
    for ax, (h, z) in zip(axes, plan):
        im = ax.imshow(tke[z], origin="lower", extent=ext, cmap="inferno",
                       norm=norm, aspect="equal")
        ax.set_title(f"h = {h:g} m (z={z})", fontsize=10)
    for ax in axes[len(plan):]:
        ax.axis("off")
    if im is not None:
        fig.colorbar(im, ax=axes, shrink=0.8, label="tke (m²/s²)")
    fig.suptitle(title or "TKE layers")
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return out_path


def render_file(vtk_path: Path, out_dir: Path, *, heights, base: float,
                step: float, quiver_step: int) -> List[Path]:
    from ..io.vtk import read_structured_points

    meta, fields = read_structured_points(vtk_path)
    spacing = float(meta.get("spacing", (1.0, 1.0, 1.0))[0]) if isinstance(
        meta.get("spacing"), (tuple, list)) else float(meta.get("spacing", 1.0))
    org = meta.get("origin", (0.0, 0.0, 0.0))
    u = fields.get("u_avg")
    if u is None:
        u = fields.get("data")    # raw velocity VTK
    written: List[Path] = []
    stem = vtk_path.stem
    if u is not None and u.ndim == 4:
        Z = u.shape[1]
        plan = _layers(Z, heights, base, step)
        if not plan:
            plan = [(base + step * z, z) for z in
                    np.linspace(0, Z - 1, min(9, Z)).astype(int)]
        written.append(render_wind_layers(
            u, out_dir / f"{stem}_wind_layers.png", plan, spacing=spacing,
            origin=(org[0], org[1]), quiver_step=quiver_step, title=stem))
    tke = fields.get("tke")
    if tke is not None:
        Z = tke.shape[0]
        plan = _layers(Z, heights, base, step)
        if not plan:
            plan = [(base + step * z, z) for z in
                    np.linspace(0, Z - 1, min(9, Z)).astype(int)]
        written.append(render_tke_layers(
            tke, out_dir / f"{stem}_tke_layers.png", plan, spacing=spacing,
            origin=(org[0], org[1]), title=stem))
    return written


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="luwtkeviz",
        description="multi-altitude wind/TKE layer figures from averaged VTK")
    p.add_argument("vtk", nargs="?", help="avg VTK file (or use --deck)")
    p.add_argument("--deck", help="deck file: batch over RESULTS/vtk/*_avg-*.vtk")
    p.add_argument("--out", default=None, help="output directory")
    p.add_argument("--heights", type=float, nargs="+", default=TARGET_HEIGHTS_M)
    p.add_argument("--base-height", type=float, default=-50.0,
                   help="height of z=0 in m (reference mapping: -50)")
    p.add_argument("--layer-step", type=float, default=10.0,
                   help="metres per z layer (reference mapping: 10)")
    p.add_argument("--quiver-step", type=int, default=0)
    args = p.parse_args(list(sys.argv[1:] if argv is None else argv))

    targets: List[Path] = []
    if args.deck:
        deck_dir = Path(args.deck).resolve().parent
        targets = sorted((deck_dir / "RESULTS" / "vtk").glob("*_avg-*.vtk"))
        if not targets:
            print(f"luwtkeviz: no averaged VTKs under {deck_dir}/RESULTS/vtk")
            return 1
        out_dir = Path(args.out) if args.out else deck_dir / "RESULTS" / "tke_viz"
    elif args.vtk:
        targets = [Path(args.vtk)]
        out_dir = Path(args.out) if args.out else targets[0].parent
    else:
        p.print_usage()
        return 2

    n = 0
    for t in targets:
        for f in render_file(t, out_dir, heights=args.heights,
                             base=args.base_height, step=args.layer_step,
                             quiver_step=args.quiver_step):
            print(f"wrote {f}")
            n += 1
    return 0 if n else 1

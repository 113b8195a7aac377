"""Grid sizing: cell size from an HBM memory budget + sponge grid extension.

TPU re-model of the reference's VRAM-driven resolution fit
(reference: setup.cpp:371-407 fit_cell_size_to_gpu_memory_request,
setup.cpp:3552-3568 top-sponge grid extension).  The byte model reflects this
framework's actual allocations instead of the OpenCL buffer set:

  per cell: fi storage (19*s bytes, double-buffered under scan) + rho (4)
  + u (12) + flags (1) [+ gi 7*s*2 + T 4 when thermal] + forcing fields.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple


def bytes_per_cell(storage: str = "f16", thermal: bool = False,
                   double_buffered: bool = True) -> float:
    s = {"f32": 4, "f16": 2, "bf16": 2, "fp16c": 2}[storage]
    mult = 2 if double_buffered else 1
    # Pure-DDF stepping only ping-pongs the DDFs, but rho/u transiently
    # double when update_fields rewrites them at event steps, so the peak
    # matches the old both-double-buffered model; +6 covers split/merge
    # transients (measured HBM peak on v5e: ~120 B/cell bf16 at 134M cells)
    total = 19 * s * mult + (4 + 12) * mult + 1 + 6
    total += 5  # nudge sigma (4) + face id (1)
    if thermal:
        total += (7 * s + 4) * mult
    return float(total)


@dataclass(frozen=True)
class GridPlan:
    cell_m: float
    nx: int
    ny: int
    nz_core: int
    nz: int                  # core + sponge extension rows
    sponge_cells: int
    sponge_extended: bool
    side_ref_z_cap: int      # top of the core region (-1 when no extension)
    bytes_per_device: int
    n_devices: int
    ny_phys: int = 0         # requested ny before fast-tier padding (0 = ny)

    @property
    def ny_out(self) -> int:
        """Rows to write in outputs (0 = all): crops fast-tier pad rows."""
        return self.ny_phys if 0 < self.ny_phys < self.ny else 0

    @property
    def ny_core(self) -> int:
        """Physical rows (the deck-requested extent, pre-padding)."""
        return self.ny_phys or self.ny


def fast_tier_ny(ny: int, nx: int, *, thermal: bool = False,
                 heavy: bool = False,
                 per_device_ny: int = 1, per_device_nx: int = 1) -> int:
    """Smallest ny' >= ny whose per-shard plane runs the Pallas fast tier.

    Planes within the VMEM budget legalize at any shape; larger planes need a
    y-tiling By | ny with By % 32 == 0 (ops/stream_collide.tile_plan).  The
    grid is extended northward by at most 31 rows per device shard (the
    domain gets marginally larger — boundary slightly farther out, like the
    top-sponge z extension) and outputs crop back to the requested rows.
    Returns ny unchanged when already legal or when no y-padding can help
    (the per-shard x extent too wide for a 32-row tile — needs more
    x-sharding).

    The probe mirrors what the runner will actually build: under an
    (Dx, Dy, ...) split each shard's kernel sees the GHOST-EXTENDED local
    plane (parallel/halo.ghost_widths — gx = 1 when Dx > 1; gy grows to 16
    when only the +32 extension legalizes), so legality is judged on
    (ny/Dy + 2*gy, nx/Dx + 2*gx), not the global plane.

    Reference contract: the per-cell kernel runs at ANY local domain size
    (kernel.cpp:1486, lbm.cpp:1125); without this the jnp tier silently
    serves over-budget unaligned planes at ~10x the step cost.
    """
    from ..ops.stream_collide import tile_plan

    d = max(1, per_device_ny)
    dx = max(1, per_device_nx)
    xl = nx // dx + 2 * int(dx > 1)

    def legal(n: int) -> bool:
        if n % d:
            return False
        loc = n // d
        if d == 1:          # no y ghosts (gy = 0)
            return tile_plan(loc, xl, thermal=thermal,
                             heavy=heavy) is not None
        # y-sharded: ghost_widths legalizes with gy = 1 or gy = 16
        return (tile_plan(loc + 2, xl, thermal=thermal,
                          heavy=heavy) is not None
                or tile_plan(loc + 32, xl, thermal=thermal,
                             heavy=heavy) is not None)

    if legal(ny):
        return ny
    # the minimal legal local tiling is By = 32; pad the LOCAL extent up to
    # a multiple of 32 (tile_plan then picks the best divisor)
    step = 32 * d
    ny2 = ((ny + step - 1) // step) * step
    if not legal(ny2):
        return ny   # x too wide for any y-tiling — padding cannot help
    return ny2


def effective_ngpu(ngpu) -> Tuple[int, int, int]:
    """The split run_case will actually use: the deck's n_gpu when enough
    devices are visible, else the single-device fallback (run/driver.py
    prints '... single-device run').  Probing the fast tier with the
    REQUESTED split would skip padding that the clamped run then needs."""
    n = (list(ngpu) + [1, 1, 1])[:3]
    dx, dy, dz = int(n[0]), int(n[1]), int(n[2])
    if dx * dy * dz > 1:
        import jax

        if len(jax.devices()) < dx * dy * dz:
            return (1, 1, 1)
    return (dx, dy, dz)


def apply_fast_tier(plan: GridPlan, *, thermal: bool = False,
                    heavy: bool = True,
                    dy: int = 1, dx: int = 1) -> GridPlan:
    """Pad the plan's ny so every device shard rides the Pallas fast tier
    (no-op when already legal or when padding cannot help).  Outputs crop
    the pad rows via plan.ny_out.

    `heavy` defaults True: deck-driven runs virtually always compile the
    forcing path (sponge/nudge) and often the wall models, which take the
    reduced plane budget (stream_collide.HEAVY_BUDGET_FRACTION).  Padding
    for the heavy budget is always safe for lighter configs — a Y that
    tiles under the reduced budget tiles (or fits untiled) under the full
    one — at worst a ≤31-row pad the run didn't strictly need."""
    from dataclasses import replace

    ny2 = fast_tier_ny(plan.ny, plan.nx, thermal=thermal, heavy=heavy,
                       per_device_ny=dy, per_device_nx=dx)
    if ny2 == plan.ny:
        return plan
    return replace(plan, ny=ny2, ny_phys=plan.ny)


def _grid_dims(si_size, cell_m: float, sponge_thickness_m: float,
               sponge_enabled: bool) -> Tuple[int, int, int, int, bool]:
    nx = max(1, int(si_size[0] / cell_m + 0.5))
    ny = max(1, int(si_size[1] / cell_m + 0.5))
    nz_core = max(1, int(si_size[2] / cell_m + 0.5))
    sponge_cells = max(1, int(round(sponge_thickness_m / cell_m)))
    extend = sponge_enabled and nz_core > 2
    nz = nz_core + (sponge_cells if extend else 0)
    return nx, ny, nz_core, nz, extend


def plan_grid(
    si_size: Tuple[float, float, float],
    *,
    cell_m: Optional[float] = None,
    memory_mb: Optional[int] = None,
    n_devices: int = 1,
    storage: str = "f16",
    thermal: bool = False,
    sponge_thickness_m: float = 0.0,
    sponge_enabled: bool = False,
    align: Tuple[int, int, int] = (1, 1, 1),
) -> GridPlan:
    """Resolve the lattice dimensions from either an explicit cell size or a
    per-device memory budget (bisection, like the reference's mesh_control).

    `align=(az, ay, ax)` optionally rounds dims up to hardware-friendly
    multiples (the Pallas tier wants X%128==0, Y%32==0).
    """
    bpc = bytes_per_cell(storage, thermal)

    def device_bytes(cm: float) -> int:
        nx, ny, _, nz, _ = _grid_dims(si_size, cm, sponge_thickness_m, sponge_enabled)
        cells = nx * ny * nz
        return int(cells * bpc / max(1, n_devices))

    if cell_m is None:
        if not memory_mb or memory_mb <= 0:
            cell_m = 20.0
        else:
            budget = memory_mb * 1024 * 1024
            lo = 0.5   # finest cell we'd ever fit
            hi = max(max(si_size), 1.0)
            while device_bytes(hi) > budget and hi < 1e6:
                hi *= 2.0
            for _ in range(60):
                mid = 0.5 * (lo + hi)
                if device_bytes(mid) <= budget:
                    hi = mid
                else:
                    lo = mid
            cell_m = hi

    nx, ny, nz_core, nz, extended = _grid_dims(
        si_size, cell_m, sponge_thickness_m, sponge_enabled)
    az, ay, ax = align
    nx = ((nx + ax - 1) // ax) * ax
    ny = ((ny + ay - 1) // ay) * ay
    nz = ((nz + az - 1) // az) * az
    sponge_cells = max(1, int(round(sponge_thickness_m / cell_m)))
    return GridPlan(
        cell_m=float(cell_m),
        nx=nx, ny=ny, nz_core=nz_core, nz=nz,
        sponge_cells=sponge_cells,
        sponge_extended=extended,
        side_ref_z_cap=(nz_core - 1) if extended else -1,
        bytes_per_device=device_bytes(cell_m),
        n_devices=n_devices,
    )

"""Fast-tier grid legalization: arbitrary deck extents must not silently
fall off the Pallas tier (reference contract: the per-cell kernel runs at
ANY local domain size, kernel.cpp:1486, lbm.cpp:1125).

Over-budget planes whose Y has no legal 32-multiple tiling get padded
northward at plan time (run/sizing.apply_fast_tier) — like the top-sponge z
extension — and outputs crop the pad rows (SolverCase.ny_out).
"""

import shutil
from pathlib import Path

import numpy as np
import pytest

from latticeurbanwind_tpu.ops.stream_collide import tile_plan
from latticeurbanwind_tpu.run.sizing import (
    apply_fast_tier, fast_tier_ny, plan_grid,
)


def test_fast_tier_ny_pads_illegal_tilings():
    # the round-3 verdict's example shape: Y=1026 over-budget plane
    assert tile_plan(1026, 1024) is None
    ny2 = fast_tier_ny(1026, 1024)
    assert ny2 == 1056 and tile_plan(ny2, 1024) is not None


def test_fast_tier_ny_noop_cases():
    # under budget: any shape legalizes untiled
    assert fast_tier_ny(499, 506) == 499
    # already legal tiling
    assert fast_tier_ny(1024, 1024) == 1024
    # X too wide for even a 32-row tile: padding cannot help
    assert fast_tier_ny(1024, 16384) == 1024


def test_fast_tier_ny_respects_device_split():
    ny2 = fast_tier_ny(1026, 1024, per_device_ny=2)
    assert ny2 % 64 == 0
    # y-sharded shards get ghost rows: ghost_widths legalizes gy=1 or gy=16
    assert (tile_plan(ny2 // 2 + 2, 1024) is not None
            or tile_plan(ny2 // 2 + 32, 1024) is not None)


def test_fast_tier_ny_probes_local_x_extent():
    """x-sharding shrinks the per-shard plane the kernel actually sees: a
    global nx too wide for any y-tiling must still be padded when the deck's
    n_gpu x-split makes the LOCAL (ghost-extended) plane legal."""
    # global probe: 16384 is too wide for even a 32-row tile
    assert fast_tier_ny(1026, 16384) == 1026
    # dx=2 leaves xl = 8194 (> 8192 budget/32) — still cannot help
    assert fast_tier_ny(1026, 16384, per_device_nx=2) == 1026
    # dx=4: xl = 4098 tiles at By=32, so padding now pays off
    ny2 = fast_tier_ny(1026, 16384, per_device_nx=4)
    assert ny2 == 1056 and tile_plan(ny2, 4098) is not None
    # combined y+x split: local ny gets ghost rows too
    ny3 = fast_tier_ny(1026, 16384, per_device_ny=2, per_device_nx=4)
    assert ny3 % 64 == 0 and tile_plan(ny3 // 2 + 32, 4098) is not None


def test_apply_fast_tier_records_crop():
    plan = plan_grid((1024.0, 1026.0, 64.0), cell_m=1.0)
    assert (plan.nx, plan.ny) == (1024, 1026)
    plan2 = apply_fast_tier(plan)
    assert plan2.ny == 1056 and plan2.ny_out == 1026 and plan2.ny_core == 1026
    # no-op plans keep ny_out == 0 (write everything)
    small = apply_fast_tier(plan_grid((100.0, 100.0, 30.0), cell_m=10.0))
    assert small.ny_out == 0 and small.ny_core == small.ny


def test_profile_mode_pads_and_crops(tmp_path, monkeypatch):
    """With a budget that outlaws the deck's native (33, 34) plane, the run
    pads ny to 64 internally and the output VTKs still carry 33 rows."""
    from latticeurbanwind_tpu.deck import load_deck
    from latticeurbanwind_tpu.io import read_structured_points
    from latticeurbanwind_tpu.run import run_deck

    monkeypatch.setenv("LUW_PLANE_BUDGET", "1300")
    src = Path("/root/reference/examples/example_ProfileResearch_noDEM")
    case = tmp_path / "caseE"
    shutil.copytree(src, case)
    deck = load_deck(case / "conf.luwpf")
    deck.set_text("mesh_control", "cell_size", quoted=True)
    deck.set_float("cell_size", 60.0)
    deck.set_int("run_nstep", 24)
    deck.set_int("purge_avg", 8)
    deck.set_int("purge_avg_stride", 4)
    deck.set_list("angle", [0.0])
    # the example deck ships n_gpu=[2,1,1]; pin single-device — under an
    # x-split the per-shard 33x19 plane fits the budget and (correctly)
    # needs no padding, which is not the path this test exercises
    deck.set_list("n_gpu", [1, 1, 1])
    deck.save()

    # the plan pads under the HEAVY budget the forcing-carrying profile run
    # uses (0.85 * 1300 = 1105): 33 rows -> 64 (32*34 = 1088 <= 1105 < 33*34)
    assert tile_plan(33, 34, heavy=True) is None
    assert fast_tier_ny(33, 34, heavy=True) == 64

    results = run_deck(case / "conf.luwpf", quiet=True)
    r = results[0]
    state_ny = np.asarray(r.state.rho).shape[1]
    assert state_ny == 64, "solver state should carry the padded rows"
    for f in r.files:
        if f.suffix != ".vtk":
            continue
        meta, fields = read_structured_points(f)
        assert meta["dims"][1] == 33, f"{f.name}: pad rows must be cropped"
        for arr in fields.values():
            assert np.isfinite(np.asarray(arr, np.float64)).all()


def test_heavy_budget_tiles_production_casee_plane():
    """Round-5 regression: the 4 m CaseE production plane (499x506 = 252k
    cells) fits the flagship 256Ki budget untiled but its HEAVY config
    (wall model + Guo forcing + nudge) measures ~500 B/cell of scoped
    VMEM stack and overflows the 120 MiB limit by 5% on chip.  Heavy
    configs take the reduced budget so sizing pads 499 -> 512 and the
    kernel y-tiles (By=256, two ~130k-cell blocks)."""
    from latticeurbanwind_tpu.lbm import StepConfig
    from latticeurbanwind_tpu.ops.stream_collide import (
        config_budget_heavy, pallas_reject_reason,
    )

    light = StepConfig(omega=1.6, storage="bf16", volume_force=False)
    heavy = StepConfig(omega=1.6, storage="bf16", volume_force=True,
                       wall_model=True, wall_cd=0.0134)
    assert not config_budget_heavy(light)
    assert config_budget_heavy(heavy)

    # light config: untiled is fine at 252k cells
    assert tile_plan(499, 506) == 499
    assert pallas_reject_reason((118, 499, 506), light) is None
    # heavy config: 499 has no 32-multiple divisor -> reject names the
    # reduced budget; sizing pads to 512, which tiles
    assert tile_plan(499, 506, heavy=True) is None
    assert pallas_reject_reason((118, 499, 506), heavy) is not None
    assert tile_plan(512, 506, heavy=True) == 256
    assert pallas_reject_reason((118, 512, 506), heavy) is None
    # the deck path's padding probe (apply_fast_tier defaults heavy=True)
    assert fast_tier_ny(499, 506, heavy=True) == 512
    assert fast_tier_ny(499, 506) == 499   # light probe unchanged


def test_billion_cell_pod_plan_fits_v5p16():
    """docs/SCALING.md v5p-16 projection, pinned: the billion-cell domain
    plans onto 16 chips within each chip's HBM, the plane class tiles on
    the fast tier at By=64, and the z-split leaves every shard >= 3 planes
    (the plane-carry kernel's minimum)."""
    from latticeurbanwind_tpu.lbm import StepConfig
    from latticeurbanwind_tpu.ops.stream_collide import (
        pallas_supported, tile_plan,
    )
    from latticeurbanwind_tpu.run.sizing import bytes_per_cell, plan_grid

    # SCALING.md slab: (Z, Y, X) = (63, 4096, 3906) at 2 m cells
    cell = 2.0
    si_size = (3906 * cell, 4096 * cell, 63 * cell)
    plan = plan_grid(si_size, cell_m=cell, n_devices=16, storage="bf16")
    cells = plan.nx * plan.ny * plan.nz
    assert cells >= 1_000_000_000, cells
    assert (plan.nz, plan.ny, plan.nx) == (63, 4096, 3906)

    # per-chip residency at the bf16 model fits v5p HBM (95 GB) with >2x
    # headroom for the step's transients and the averaging accumulators
    per_chip = cells * bytes_per_cell("bf16") / 16
    assert per_chip < 95e9 / 2, per_chip / 2**30

    # fast-tier legality of the local slab (z-split: full plane per shard)
    cfg = StepConfig(omega=1.0, storage="bf16")
    assert tile_plan(plan.ny, plan.nx) == 64
    assert pallas_supported((plan.nz, plan.ny, plan.nx), cfg)
    # 16-way z split: ~4 planes per shard, above the 3-plane minimum
    assert plan.nz // 16 >= 3

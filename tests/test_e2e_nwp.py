"""End-to-end flagship path: synthetic WRF NetCDF -> makeluw pipeline ->
patch-2D standard-mode solve -> postprocessing exports.

This is the route a production user runs (reference call stack SURVEY §3.1
+ §3.2); round 1 could not exercise it because buildBC never emitted the
patch column.  Runs on the CPU backend with a coarse grid.
"""

import numpy as np
import pytest

from tests.test_wrf_ingest import _write_wrf_nc3


@pytest.fixture()
def nwp_case(tmp_path):
    from latticeurbanwind_tpu.deck import parse_deck_text
    from latticeurbanwind_tpu.pre.shp_reader import write_polygon_shp

    case = tmp_path / "case"
    (case / "wind_bc").mkdir(parents=True)
    (case / "building_db").mkdir()
    deck = parse_deck_text(
        "// LUW deck\ncasename = nwp\ndatetime = 20251010120000\n"
        "base_height = 20.0\nz_limit = 180\nmidmesh_basesize = 50\n"
        "cell_size = 40\nmesh_control = \"cell_size\"\n"
        "run_nstep = 30\npurge_avg = 10\npurge_avg_stride = 2\n"
        "coriolis_term = true\nenable_buffer_nudging = true\n"
        "enable_top_sponge = true\nturb_inflow_enable = true\n"
        "vk_inlet_nmodes = 8\nhigh_order = false\n")
    deck.save(case / "conf.luw")
    _write_wrf_nc3(case / "wind_bc" / "nwp_20251010120000.nc")
    # a few footprints inside the WRF tile (lon 121.3.., lat 31.1..)
    polys, heights = [], []
    for i in range(2):
        for j in range(2):
            x0 = 121.33 + i * 0.002
            y0 = 31.13 + j * 0.002
            w = 0.0008
            polys.append([(x0, y0), (x0 + w, y0), (x0 + w, y0 + w), (x0, y0 + w)])
            heights.append(25.0 + 10 * i)
    write_polygon_shp(case / "building_db" / "buildings.shp", polys,
                      heights=heights)
    return case


def test_nwp_pipeline_to_solver(nwp_case):
    from latticeurbanwind_tpu.cli.makeluw import main as makeluw_main
    from latticeurbanwind_tpu.deck import load_deck
    from latticeurbanwind_tpu.io.vtk import read_structured_points
    from latticeurbanwind_tpu.run import run_deck

    deck_path = nwp_case / "conf.luw"
    assert makeluw_main([str(deck_path)]) == 0

    # buildBC wrote the patch CSV + writebacks
    csv = nwp_case / "proj_temp" / "SurfData_20251010120000.csv"
    header = csv.read_text().splitlines()[0]
    assert header.endswith(",patch")
    deck = load_deck(deck_path)
    assert deck.get_text("validation") == "pass"
    assert deck.get_text("downstream_bc")

    # solver: standard mode must select the patch-2D BC route
    res = run_deck(deck_path, quiet=True)
    assert res and res[0].total_steps == 30
    avgs = sorted((nwp_case / "RESULTS" / "vtk").glob("*_avg-*.vtk"))
    assert avgs
    meta, fields = read_structured_points(avgs[-1])
    assert np.isfinite(fields["u_avg"]).all()
    speed = np.linalg.norm(fields["u_avg"], axis=0)
    fluid = fields["fluid"] > 0.5
    assert speed[fluid].max() > 1.0      # SI winds survived the round trip

    # postprocessing exports parse back
    from latticeurbanwind_tpu.post.vtk2nc import main as vtk2nc_main

    assert vtk2nc_main([str(deck_path)]) == 0
    ncs = sorted((nwp_case / "RESULTS").glob("*.nc"))
    assert ncs

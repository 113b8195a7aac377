"""16-direction wind-rose end-to-end: the full compass .luwdg sweep runs
case-parallel over the device mesh and feeds `luwseason`'s native
derived-windrose synthesis — the reference's production workflow
(setup.cpp:5642-5761 batch cases; tools_core/season_average.py windrose
weighting) at its real 16-direction cardinality."""

import shutil
from pathlib import Path

import numpy as np

EXAMPLE = Path(__file__).resolve().parents[1] / "examples" / "example_DatasetGen"


def test_windrose_16_direction_sweep_to_season(tmp_path):
    from latticeurbanwind_tpu.deck import load_deck
    from latticeurbanwind_tpu.io.vtk import read_structured_points
    from latticeurbanwind_tpu.post.season_average import (
        ANGLE_SEQUENCE, COMPASS, main as season_main,
    )
    from latticeurbanwind_tpu.run import run_deck

    home = tmp_path / "rose"
    shutil.copytree(EXAMPLE, home)
    deck = load_deck(home / "conf.luwdg")
    deck.set_text("mesh_control", "cell_size", quoted=True)
    deck.set_float("cell_size", 30.0)
    deck.set_int("run_nstep", 24)
    deck.set_int("purge_avg", 12)
    deck.set_int("purge_avg_stride", 4)
    deck.set_list("inflow", [6.0])
    deck.set_list("angle", list(ANGLE_SEQUENCE))     # all 16 compass points
    deck.set_bool("case_parallel", True)             # 8-device mesh -> 2 waves
    deck.save()

    results = run_deck(home / "conf.luwdg", quiet=True)
    assert len(results) == 16
    assert all("case_parallel_batch" in r.timing for r in results)

    dt = deck.get_text("datetime")
    avg_files = sorted((home / "RESULTS" / "vtk").glob(f"DG_*{dt}_avg-*.vtk"))
    assert len(avg_files) == 16

    # a realistic rose: prevailing SW sector, single 4-8 m/s bin whose
    # center (6) equals the 10 m profile speed -> velocity weight == prob
    (home / "wind_bc").mkdir(exist_ok=True)
    (home / "wind_bc" / "profile.dat").write_text(
        "z,U\n1\t3.0\n10\t6.0\n100\t9.0\n")
    probs = np.array([2, 2, 3, 3, 4, 5, 6, 8, 10, 14, 16, 11, 7, 4, 3, 2],
                     float)
    probs *= 100.0 / probs.sum()
    rows = ["dir,C1_4_8"] + [f"{c},{p:.6f}" for c, p in zip(COMPASS, probs)]
    (home / "wind_bc" / "windrose_10m.csv").write_text("\n".join(rows) + "\n")

    assert season_main([str(home / "conf.luwdg"), "--dpi", "40"]) == 0

    out = home / "RESULTS" / "vtk" / f"SEASON_{dt}_avg.vtk"
    meta, season = read_structured_points(out)
    assert "u_avg" in season and "fluid" in season

    # derived weights recorded for every compass direction
    wcsv = (home / "RESULTS" / "season_weights.csv").read_text().splitlines()
    assert len(wcsv) == 17
    weights = {float(l.split(",")[0]): tuple(float(v) for v in l.split(",")[1:])
               for l in wcsv[1:]}
    assert set(weights) == set(ANGLE_SEQUENCE)
    assert abs(sum(w[2] for w in weights.values()) - 1.0) < 1e-6

    # the seasonal u_avg is EXACTLY the windrose-weighted combination of
    # the 16 directional averages (vref == bin center -> vel weight == prob)
    expect = None
    for f in avg_files:
        ang = float(f.name.split("_")[2])
        _, fields = read_structured_points(f)
        contrib = fields["u_avg"].astype(np.float64) * weights[ang][0]
        expect = contrib if expect is None else expect + contrib
    np.testing.assert_allclose(season["u_avg"], expect, rtol=1e-5, atol=1e-6)
    # prevailing-direction sanity: SW (225) carries the largest weight
    assert max(weights, key=lambda a: weights[a][2]) == 225.0

    summary = (home / "RESULTS" / "season_summary.txt").read_text()
    assert summary.count("angle ") >= 16
    figs = list((home / "RESULTS" / "figures").glob(f"season_{dt}_*.png"))
    assert figs, "seasonal figures missing"

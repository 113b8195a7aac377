"""dgPrepare geometry prep + buildingscale morphology on the real example."""

import shutil
from pathlib import Path

import numpy as np
import pytest

from latticeurbanwind_tpu.deck import load_deck
from latticeurbanwind_tpu.geometry import read_stl


def test_dgprepare_reproduces_case_e_extents(tmp_path):
    from latticeurbanwind_tpu.pre.dgprepare import main as dgprepare

    case = tmp_path / "dg"
    (case / "building_db").mkdir(parents=True)
    shutil.copy(
        "/root/reference/examples/example_ProfileResearch_noDEM/building_db/rawbuildings.stl",
        case / "building_db" / "rawbuildings.stl")
    (case / "conf.luwpf").write_text(
        "casename = CaseE\nbase_height = 20.0\nz_limit = 250\n"
        "x_exp_rat = 5\ny_exp_rat = 5\nangle = [0]\n")
    assert dgprepare([str(case / "conf.luwpf")]) == 0
    deck = load_deck(case / "conf.luwpf")
    # must reproduce the example's generated extents (conf.luwpf in the
    # reference repo records si_x_cfd=[0, 2022.500153], si_y=[0, 1996.500092])
    assert deck.get_pair("si_x_cfd")[1] == pytest.approx(2022.5, abs=0.01)
    assert deck.get_pair("si_y_cfd")[1] == pytest.approx(1996.5, abs=0.01)
    assert deck.get_pair("si_z_cfd") == (0.0, 270.0)
    stl = read_stl(case / "proj_temp" / "CaseE_PF.stl")
    np.testing.assert_allclose(stl.pmin, [0, 0, 0], atol=1e-3)


def test_morphology_stats():
    from latticeurbanwind_tpu.post.buildingscale import morphology_stats

    solid = np.zeros((10, 8, 8), dtype=bool)
    solid[0] = True                      # ground plane
    solid[1:6, 2:4, 2:4] = True          # one 2x2 tower, 5 cells tall
    stats = morphology_stats(solid, cell_m=10.0, ground_k=1)
    assert stats["lambda_p"] == pytest.approx(4 / 64)
    assert stats["mean_height_m"] == pytest.approx(50.0)
    assert stats["max_height_m"] == pytest.approx(50.0)
    assert stats["built_columns"] == 4
    assert stats["lambda_f_x"] > 0

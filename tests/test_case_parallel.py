"""Case-parallel batch execution (run/batch.py): the .luwdg sweep sharded
one-case-per-device over the mesh must reproduce the serial driver's
outputs (reference runs batches strictly serially, setup.cpp:5690-5753)."""

import shutil
from pathlib import Path

import numpy as np
import pytest

EXAMPLE = Path(__file__).resolve().parents[1] / "examples" / "example_DatasetGen"


def _prep(case_dir: Path, parallel: bool, angles=(0.0, 45.0, 90.0)):
    from latticeurbanwind_tpu.deck import load_deck

    shutil.copytree(EXAMPLE, case_dir)
    deck = load_deck(case_dir / "conf.luwdg")
    deck.set_text("mesh_control", "cell_size", quoted=True)
    deck.set_float("cell_size", 30.0)
    deck.set_int("run_nstep", 30)
    deck.set_int("purge_avg", 12)
    deck.set_int("purge_avg_stride", 3)
    deck.set_list("inflow", [6.0])
    deck.set_list("angle", list(angles))
    deck.set_bool("case_parallel", parallel)
    deck.save()
    return case_dir / "conf.luwdg"


def test_datagen_case_parallel_matches_serial(tmp_path):
    from latticeurbanwind_tpu.io import read_structured_points
    from latticeurbanwind_tpu.run import run_deck

    angles = (0.0, 45.0, 90.0)
    serial = run_deck(_prep(tmp_path / "serial", False, angles), quiet=True)
    par = run_deck(_prep(tmp_path / "par", True, angles), quiet=True)
    assert len(serial) == len(par) == len(angles)
    assert all("case_parallel_batch" in r.timing for r in par)

    for rs, rp in zip(serial, par):
        fs = {f.name: f for f in rs.files if f.suffix == ".vtk"}
        fp = {f.name: f for f in rp.files if f.suffix == ".vtk"}
        assert set(fs) == set(fp)
        avg_name = next(n for n in fs if "_avg-" in n)
        _, a_s = read_structured_points(fs[avg_name])
        _, a_p = read_structured_points(fp[avg_name])
        assert set(a_s) == set(a_p)
        for key in ("u_avg", "rho_avg", "fluid", "tke"):
            np.testing.assert_allclose(
                a_p[key], a_s[key], rtol=2e-4, atol=2e-5,
                err_msg=f"{avg_name}:{key}")
    # distinct angles produce distinct flow fields (not all padding copies)
    _, a0 = read_structured_points(
        next(f for f in par[0].files if "_avg-" in f.name))
    _, a1 = read_structured_points(
        next(f for f in par[1].files if "_avg-" in f.name))
    assert np.abs(a0["u_avg"] - a1["u_avg"]).max() > 0.1


def test_case_parallel_unsupported_reasons():
    from latticeurbanwind_tpu.run.batch import case_parallel_unsupported
    from latticeurbanwind_tpu.run.driver import RunSettings, SolverCase

    class Dummy:
        pass

    def mk(**kw):
        from latticeurbanwind_tpu.lbm.state import (
            Forcing, LBMState, StepConfig,
        )

        shape = (4, 8, 8)
        st = LBMState(
            fi=np.zeros((19, *shape), np.float32),
            rho=np.zeros(shape, np.float32),
            u=np.zeros((3, *shape), np.float32),
            flags=np.zeros(shape, np.uint8), gi=None, T=None)
        base = dict(
            config=StepConfig(omega=1.0), forcing=Forcing(), state=st,
            dyn=None, units=None, cell_m=1.0, parent=Path("."),
            datetime="0", settings=RunSettings(run_nstep=10))
        base.update(kw)
        return SolverCase(**base)

    a, b = mk(), mk()
    assert case_parallel_unsupported([a]) is not None          # single case
    assert case_parallel_unsupported([a, b]) is None
    assert "probe" in case_parallel_unsupported([mk(probes=[object()]), b])
    assert "VK" in case_parallel_unsupported([mk(pre_step=object()), b])
    assert "serial driver" in case_parallel_unsupported(
        [mk(settings=RunSettings(run_nstep=10, unsteady_output=5)), b])
    assert "n_gpu" in case_parallel_unsupported([mk(ngpu=(2, 1, 1)), b])

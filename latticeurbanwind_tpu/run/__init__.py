from .sizing import GridPlan, bytes_per_cell, plan_grid
from .welford import AvgState, init_avg, variance_sum_u, welford_update
from .driver import RunResult, RunSettings, SolverCase, run_case, vtk_timestep_name
from .probes import GridProbe
from .modes import run_datagen_mode, run_deck, run_profile_mode

__all__ = [
    "GridPlan", "bytes_per_cell", "plan_grid",
    "AvgState", "init_avg", "variance_sum_u", "welford_update",
    "RunResult", "RunSettings", "SolverCase", "run_case", "vtk_timestep_name",
    "GridProbe", "run_datagen_mode", "run_deck", "run_profile_mode",
]

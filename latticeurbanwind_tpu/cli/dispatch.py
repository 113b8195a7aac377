"""Single CLI dispatch point for all LUW commands.

`python -m latticeurbanwind_tpu.cli.dispatch <command> [args...]`
Command name -> handler mapping matches the reference bin/ set
(SURVEY.md §2.3 CLI contract).
"""

from __future__ import annotations

import sys


def _lazy(modname, attr="main"):
    def run(argv):
        import importlib

        mod = importlib.import_module(modname, package=__package__)
        return getattr(mod, attr)(argv)

    return run


COMMANDS = {
    "makeluw": _lazy(".makeluw"),
    "runluw": _lazy(".run"),
    "luwbc": _lazy("latticeurbanwind_tpu.pre.buildbc", "main"),
    "luwcut": _lazy("latticeurbanwind_tpu.pre.shpcutter", "main"),
    "luwvox": _lazy("latticeurbanwind_tpu.pre.voxelization", "main"),
    "luwdem": _lazy("latticeurbanwind_tpu.pre.dem_ingest", "main"),
    "luwval": _lazy(".validate"),
    "cdfinspect": _lazy(".inspect_tools", "cdfinspect_main"),
    "shpinspect": _lazy(".inspect_tools", "shpinspect_main"),
    "cleanluw": _lazy(".clean"),
    "visluw": _lazy("latticeurbanwind_tpu.post.visluw", "main"),
    "vtk2nc": _lazy("latticeurbanwind_tpu.post.vtk2nc", "main"),
    "luwcutvis": _lazy("latticeurbanwind_tpu.post.cut_vis", "main"),
    "luwspectra": _lazy("latticeurbanwind_tpu.post.les_spectra", "main"),
    "luwseason": _lazy("latticeurbanwind_tpu.post.season_average", "main"),
    "dgprepare": _lazy("latticeurbanwind_tpu.pre.dgprepare", "main"),
    "buildingscale": _lazy("latticeurbanwind_tpu.post.buildingscale", "main"),
    "luwutmnc": _lazy("latticeurbanwind_tpu.post.vtk_avg_to_utm_asl_nc", "main"),
    "luwenv": _lazy("latticeurbanwind_tpu.utils.accelerator", "main"),
    "luwtkeviz": _lazy("latticeurbanwind_tpu.post.tke_viz", "main"),
    "luwvideo": _lazy("latticeurbanwind_tpu.post.video", "main"),
    "luwaij": _lazy("latticeurbanwind_tpu.post.aij_casee", "main"),
    "luwstudio": _lazy("latticeurbanwind_tpu.gui.server", "main"),
    "visdem": _lazy(".dem_shp_tools", "visdem_main"),
    "shptester": _lazy(".dem_shp_tools", "shptester_main"),
}


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("Usage: dispatch <command> [args...]")
        print("Commands:", ", ".join(sorted(COMMANDS)))
        return 2
    cmd = sys.argv[1]
    handler = COMMANDS.get(cmd)
    if handler is None:
        print(f"Unknown command: {cmd}")
        print("Commands:", ", ".join(sorted(COMMANDS)))
        return 2
    rc = handler(sys.argv[2:])
    return int(rc or 0)


if __name__ == "__main__":
    sys.exit(main())

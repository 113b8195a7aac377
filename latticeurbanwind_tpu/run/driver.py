"""Solver run driver: the TPU-native equivalent of the reference's run_lbm
loop (setup.cpp:4117-4911).

Responsibilities:
  * step the lattice in jit-compiled scan chunks (few distinct chunk lengths
    to bound compile count),
  * Welford mean/variance accumulation over the final `purge_avg` window at
    `purge_avg_stride` — on device (the reference reads fields back to the
    host per sample),
  * unsteady u VTK snapshots every `unsteady_output` steps,
  * probe column sampling over the probe window,
  * two-phase timing plan (normal vs averaging phase step cost) + ETA,
  * finalize: transient u/rho/T VTKs, `<prefix><datetime>_avg-<t>.vtk` with
    u_avg/rho_avg[/T_avg]/fluid + tke/TI/TLS, probe CSVs, transform.info.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..io.progress import ProgressEmitter
from ..io.vtk import write_structured_points
from ..lbm.state import DynParams, Forcing, LBMState, StepConfig
from ..lbm.stepper import make_runner
from ..units import Units
from .derived import derived_turbulence_fields
from .info import RunInfo
from .probes import GridProbe
from .welford import AvgState, init_avg, variance_sum_u, welford_update

DEFAULT_RUN_STEPS = 20001


def vtk_timestep_name(name: str, t: int) -> str:
    """`<name>-<9-digit t>.vtk` (reference default_filename, lbm.cpp:235)."""
    return f"{name}-{t:09d}.vtk"


@dataclass
class RunSettings:
    run_nstep: int = 0                 # 0 -> default 20001
    research_output: int = 0
    unsteady_output: int = 0
    purge_avg: int = 0
    purge_avg_stride: int = 1
    output_fields: Tuple[str, ...] = ("tke", "ti", "tls")
    chunk: int = 50                    # max steps per compiled scan chunk
    checkpoint_interval: int = 0       # save state every N steps (0 = off)
    resume: bool = True                # resume from an existing checkpoint
    snapshots: bool = True             # render PNG snapshots at unsteady events
    frame_output: int = 0              # perspective video frame every N steps


@dataclass
class SolverCase:
    """Everything needed to run one LBM case."""

    config: StepConfig
    forcing: Forcing
    state: LBMState
    dyn: DynParams
    units: Units
    cell_m: float
    parent: Path
    datetime: str
    vtk_prefix: str = ""
    nz_out: int = 0                    # crop output above this (sponge rows)
    ny_out: int = 0                    # crop output beyond this (fast-tier pad)
    settings: RunSettings = field(default_factory=RunSettings)
    probes: List[GridProbe] = field(default_factory=list)
    thermal_output: bool = False       # include T in outputs/averaging
    origin_shift: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    impl: str = "auto"
    pre_step: Optional[object] = None  # callable (state, t) -> state (VK inlet)
    ngpu: Tuple[int, int, int] = (1, 1, 1)  # deck n_gpu -> device-mesh split


@dataclass
class RunResult:
    state: Optional[LBMState]
    avg: Optional[AvgState]
    total_steps: int
    solver_seconds: float
    files: List[Path]
    timing: Dict[str, float]

    def release_device_state(self) -> None:
        """Drop the device-resident final state + Welford accumulator.

        A completed case pins ~2.5 GB HBM per 30M cells through these
        references; serial multi-case batches (.luwpf angle sweeps,
        .luwdg matrices) must release each case before solving the next or
        a 4-case production sweep RESOURCE_EXHAUSTs a 16 GB chip.  The
        batch loops keep only the final case's state (single-case runs are
        unaffected); everything user-facing is already on disk in
        `files`/`timing`."""
        self.state = None
        self.avg = None


def _sync(state: LBMState) -> None:
    import jax.numpy as jnp

    float(jnp.asarray(state.rho[0, 0, 0]))


def _crop_y(arr: np.ndarray, ny_out: int) -> np.ndarray:
    """Drop fast-tier pad rows from a (..., Z, Y, X) output array."""
    if ny_out and 0 < ny_out < arr.shape[-2]:
        return arr[..., :ny_out, :]
    return arr


def _warn_slow_tier(impl_name: str, shape, case: SolverCase) -> None:
    """Loud, actionable warning when a sizable grid steps the jnp tier on an
    accelerator (~10x the Pallas step cost) — silent fallbacks at production
    sizes read as 'the TPU is slow' (reference runs its per-cell kernel at
    any local size, kernel.cpp:1486, so there is no analogous cliff).
    Deliberately NOT gated on run_case(quiet=): a performance cliff must
    surface even in quiet batch sweeps (CPU runs return early above)."""
    if impl_name != "reference":
        return
    import jax

    if jax.default_backend() == "cpu" or int(np.prod(shape)) < (1 << 21):
        return
    from ..ops.stream_collide import config_budget_heavy, tile_plan
    Z, Y, X = shape
    dx, dy, dz = case.ngpu
    reason = "unsupported step configuration"
    if int(np.prod(case.ngpu)) > 1 and (Z % dz or Y % dy or X % dx):
        reason = f"grid {shape} not divisible by n_gpu split {list(case.ngpu)}"
    elif Z < 3 or Y < 8 or X < 8:
        reason = f"grid too thin for the kernel (Z={Z}, Y={Y}, X={X})"
    elif tile_plan(Y, X, thermal=case.config.thermal,
                   heavy=config_budget_heavy(case.config)) is None:
        reason = (f"({Y}, {X}) plane exceeds the VMEM budget with no legal "
                  "y-tiling — X too wide for a 32-row tile; shard over x "
                  "(n_gpu) or coarsen the cell size")
    elif case.pre_step is not None and getattr(case.pre_step, "ddf", None) is None:
        reason = "pre-step hook has no DDF (pallas) variant"
    msg = (f"WARNING: {int(np.prod(shape)) / 1e6:.0f}M-cell grid is stepping "
           f"the SLOW jnp reference tier (~10x step cost): {reason}")
    print(msg, flush=True)


def run_case(case: SolverCase, *, quiet: bool = False) -> RunResult:
    import jax.numpy as jnp

    s = case.settings
    total_steps = (s.run_nstep if s.run_nstep > 0 else DEFAULT_RUN_STEPS) + max(s.research_output, 0)
    avg_window = min(s.purge_avg, total_steps) if s.purge_avg > 0 else 0
    avg_stride = max(1, s.purge_avg_stride)
    avg_start = total_steps - avg_window + 1 if avg_window else total_steps + 1
    unsteady = max(0, s.unsteady_output)
    frames = max(0, s.frame_output)
    probe_window = avg_window if case.probes else 0
    probe_start = total_steps - probe_window + 1 if probe_window else total_steps + 1

    shape = case.state.rho.shape
    progress = ProgressEmitter("solve")
    files: List[Path] = []

    # --- device mesh (deck n_gpu = [Dx, Dy, Dz]) ---------------------------
    # Multi-device runs shard the lattice over a device mesh (the reference's
    # domain-split + PCIe halo pipeline, lbm.cpp:1067-1958, collapses into
    # sharded-array semantics).  Any divisible (Dx, Dy, Dz) split upgrades to
    # the explicit shard_map pallas runner (parallel/halo.py: z via plane
    # halos, y/x via ghost layers); the VK inlet rides along for z-only
    # splits.  Everything else falls back to GSPMD over the jnp tier.
    mesh = None
    eff_impl = case.impl
    ndev = int(np.prod(case.ngpu))
    use_sharded_pallas = False
    if ndev > 1:
        import jax

        from ..lbm.stepper import _pallas_ok

        if len(jax.devices()) >= ndev:
            from ..parallel import domain_mesh
            from ..parallel.halo import local_shape_for

            mesh = domain_mesh(tuple(case.ngpu))
            dx, dy, dz = case.ngpu
            from ..ops.stream_collide import config_budget_heavy

            local = local_shape_for(shape, (dx, dy, dz),
                                    case.config.thermal,
                                    config_budget_heavy(case.config))
            # the DDF inlet hook is shard-aware for any (Dx, Dy, Dz) split
            # (bc/vk_inlet.py _ddf_apply shard kwargs)
            vk_ok = (case.pre_step is None
                     or getattr(case.pre_step, "ddf", None) is not None)
            use_sharded_pallas = (
                shape[0] % dz == 0 and shape[1] % dy == 0 and shape[2] % dx == 0
                and vk_ok
                and _pallas_ok(local, case.config)
                and case.impl in ("auto", "pallas"))
            if not use_sharded_pallas and eff_impl == "auto":
                eff_impl = "reference"   # GSPMD tier; pallas_call is local-only
            if not quiet:
                print(f"| Device mesh     | n_gpu={list(case.ngpu)} -> "
                      f"{ndev}-device mesh "
                      f"({'shard_map pallas' if use_sharded_pallas else 'GSPMD'})")
        elif not quiet:
            print(f"| Device mesh     | n_gpu={list(case.ngpu)} requested, "
                  f"{len(jax.devices())} device(s) visible — single-device run")

    # ONE runner with a traced trip count serves every chunk length — the
    # event schedule produces irregular chunk sizes, and a static-length
    # loop would recompile the kernel per distinct size (minutes per
    # variant on production grids).
    if use_sharded_pallas:
        from ..parallel.halo import make_sharded_pallas_runner

        advance = make_sharded_pallas_runner(
            case.config, case.forcing, shape, mesh, n_inner=1,
            pre_step=getattr(case.pre_step, "ddf", None),
            init_u=case.state.u, init_T=case.state.T)
        impl_name = "pallas-sharded"
    else:
        advance, impl_name = make_runner(
            case.config, case.forcing, shape=shape, n_inner=1,
            impl=eff_impl, donate=True, pre_step=case.pre_step)
    _warn_slow_tier(impl_name, shape, case)

    # pallas tiers step pure DDFs: refresh rho/u/T before field-consuming
    # events (the reference's update_fields split, kernel.cpp:1938)
    if getattr(advance, "fields_stale", False):
        from ..lbm.fields import update_fields

        def refresh(st: LBMState) -> LBMState:
            return update_fields(st, case.config, case.dyn, donate=True)
    else:
        def refresh(st: LBMState) -> LBMState:
            return st

    def runner(n: int):
        return lambda st, dyn, t: advance(st, dyn, t, n)

    # event times where we must stop stepping
    events = set()
    if unsteady:
        events.update(range(unsteady, total_steps + 1, unsteady))
    if frames:
        events.update(range(frames, total_steps + 1, frames))
    if avg_window:
        events.update(range(avg_start, total_steps + 1, avg_stride))
    if probe_window:
        events.update(range(probe_start, total_steps + 1, avg_stride))
    if s.checkpoint_interval > 0:
        events.update(range(s.checkpoint_interval, total_steps + 1,
                            s.checkpoint_interval))
    events.add(total_steps)
    event_list = sorted(events)

    state = case.state
    avg = init_avg(shape, case.thermal_output) if avg_window else None
    avg_samples = 0
    resume_t = 0
    ckpt_path = None
    if s.checkpoint_interval > 0:
        from .checkpoint import checkpoint_path, load_checkpoint, save_checkpoint

        ckpt_path = checkpoint_path(case.parent, case.datetime, case.vtk_prefix)
        if s.resume and ckpt_path.exists():
            try:
                state, resume_t, avg_loaded, avg_samples, _ = load_checkpoint(
                    ckpt_path, expect_shape=shape, probes=case.probes)
                if avg_loaded is not None:
                    avg = avg_loaded
                # restore the carried nudge/sponge face targets so VK+nudge
                # runs continue bit-exactly (without this the targets revert
                # to the initial values until the next VK anchor refresh).
                # A mesh change between save and resume changes the ghost
                # padding of the sharded runner's FaceBC — then skip the
                # restore (targets refresh at the next VK anchor) instead of
                # discarding the whole checkpoint.
                if hasattr(advance, "set_fbc"):
                    from .checkpoint import load_fbc

                    try:
                        fbc_saved = load_fbc(ckpt_path)
                        if fbc_saved is not None:
                            advance.set_fbc(fbc_saved)
                    except ValueError as e:
                        print("| Checkpoint      | face targets not restored "
                              f"({e}); they refresh at the next VK anchor")
                if not quiet:
                    print(f"| Checkpoint      | resumed from step {resume_t}")
            except (ValueError, KeyError, OSError) as e:
                print(f"| Checkpoint      | ignoring unreadable checkpoint: {e}")
                resume_t = 0

    if mesh is not None:
        from ..parallel import shard_state

        state = shard_state(state, mesh)
    elif resume_t:
        # checkpoint loads return HOST arrays (so sharded resumes never
        # materialize the global state on one device); commit the
        # single-device case up front to keep step donation effective
        import jax

        state = jax.device_put(state)
    if resume_t and avg is not None:
        # same for the restored accumulator: welford_update donates it
        from .welford import place_avg

        avg = place_avg(avg, mesh)

    u_factor = case.units.si_u(1.0)
    rho_factor = case.units.si_rho(1.0)
    dt_si = case.units.si_t(1)
    vtk_dir = case.parent / "RESULTS" / "vtk"
    raw_base = f"{case.vtk_prefix}{case.datetime}_raw_"

    def write_raw(name: str, data: np.ndarray, t: int, affine_T: bool = False):
        arr = _crop_y(np.asarray(data), case.ny_out)
        if affine_T:
            arr = arr * case.units.unit_K + case.units.unit_K_offset
        path = vtk_dir / vtk_timestep_name(raw_base + name, t)
        write_structured_points(
            path, {"data": arr.astype(np.float32)},
            spacing=case.cell_m, origin_shift=case.origin_shift,
            nz_write=case.nz_out,
        )
        files.append(path)
        return path

    # --- timing plan: normal benchmark ------------------------------------
    info = RunInfo(total_steps=total_steps,
                   avg_start=avg_start if avg_window else 0,
                   n_cells=int(np.prod(shape)),
                   storage=case.config.storage,
                   thermal=case.config.thermal)
    # fused moments+Welford kernel for averaging-only events: pure-DDF
    # tier, single device, supported plane, non-thermal (gate inside)
    avg_fused = None
    if (avg_window and mesh is None
            and getattr(advance, "fields_stale", False)):
        try:
            from ..ops.avg_kernel import make_avg_update

            avg_fused = make_avg_update(case.config, shape)
        except NotImplementedError:
            avg_fused = None

    t = resume_t
    t0 = time.perf_counter()
    next_events = [e for e in event_list if e > t]
    avail = (next_events[0] if next_events else total_steps) - t
    bench_steps = 0 if t else min(16, avail // 2, total_steps)
    info.start(t)
    calibrated = False
    if bench_steps > 0:
        # first batch warms up (jit compile) so the calibration batch times
        # pure stepping — the reference's OpenCL program is likewise compiled
        # before its 16-step benchmark (setup.cpp:4799-4841).  Both batches
        # use the same runner length, so no extra compilation happens.
        state = runner(bench_steps)(state, case.dyn, t)
        _sync(state)
        t += bench_steps
        info.start(t)
        state = runner(bench_steps)(state, case.dyn, t)
        _sync(state)
        t += bench_steps
        info.update(t)
        calibrated = True
    timing = {"normal_steps_per_second": info.steps_per_second()}
    if not quiet and calibrated:
        print(info.timing_plan(impl_name)
              + f", ETA {info.eta_seconds(t):.1f} s")
    progress.emit("Solving CFD", f"{t}/{total_steps} steps", t, total_steps)

    avg_phase_t0 = None
    last_unsteady_t = -1

    for ev in event_list:
        if ev <= resume_t:
            continue   # already handled before the interruption
        while t < ev:
            n = min(s.chunk, ev - t)
            state = runner(n)(state, case.dyn, t)
            t += n
            if not quiet and progress.enabled:
                _sync(state)
                info.update(t)
                progress.emit(
                    "Solving CFD",
                    f"{t}/{total_steps} steps | "
                    f"{info.steps_per_second():.1f} Steps/s | "
                    f"ETA {info.eta_seconds(t):.0f} s",
                    t, total_steps)
        # event actions at step t: materialize fields once if anything
        # field-consuming fires here (pure-DDF tiers keep rho/u/T stale)
        fires_avg = (avg_window and t >= avg_start
                     and (t - avg_start) % avg_stride == 0)
        wants_fields = (
            (case.probes and t >= probe_start and (t - probe_start) % avg_stride == 0)
            or (unsteady and t % unsteady == 0 and t > 0 and t != last_unsteady_t)
            or (frames and t % frames == 0 and t > 0)
            or (ckpt_path is not None and s.checkpoint_interval > 0
                and t % s.checkpoint_interval == 0 and t > resume_t)
            or t == total_steps
            # averaging-only events ride the fused moments+Welford kernel
            # (ops/avg_kernel.py) when one is available: ONE streaming pass
            # updates the accumulators in place instead of the full
            # update_fields + welford_update pair (~6x cheaper — the
            # averaging phase otherwise dominates production wall clock)
            or (fires_avg and avg_fused is None))
        if wants_fields:
            state = refresh(state)
        if fires_avg:
            if avg_phase_t0 is None:
                _sync(state)
                avg_phase_t0 = time.perf_counter()
                avg_phase_start_t = t
            if avg_fused is not None and not wants_fields:
                avg = avg_fused(state, avg, case.dyn,
                                1.0 / float(avg_samples + 1))
            else:
                avg = welford_update(avg, state)
            avg_samples += 1
        if case.probes and t >= probe_start and (t - probe_start) % avg_stride == 0:
            # ONE batched device->host readback for all probe columns (the
            # reference batches its averaging-path readbacks the same way,
            # setup.cpp:4498-4509); per-probe gathers serialize against the
            # step stream through the device queue
            ys = np.array([p.y for p in case.probes])
            xs = np.array([p.x for p in case.probes])
            cols = np.asarray(state.u[:, :, ys, xs])     # (3, Z, P)
            for pi, p in enumerate(case.probes):
                p.sample_column(cols[:, :, pi], t * dt_si, u_factor)
        if frames and t % frames == 0 and t > 0:
            # per-event video frame (reference setup.cpp:4843-4861) —
            # PNG only, ffmpeg-ready numbering, perspective camera
            from .snapshots import write_frame

            frame = case.parent / "proj_temp" / "frames" / (
                f"{case.vtk_prefix}{case.datetime}_{t // frames:06d}.png")
            files.append(write_frame(
                state, frame, nz_out=case.nz_out,
                title=f"{case.vtk_prefix}{case.datetime} step {t}"))
        if unsteady and t % unsteady == 0 and t > 0 and t != last_unsteady_t:
            write_raw("u", np.asarray(state.u) * u_factor, t)
            last_unsteady_t = t
            if s.snapshots:
                from .snapshots import write_snapshot

                snap = case.parent / "proj_temp" / "snapshots" / (
                    f"{case.vtk_prefix}{case.datetime}_{t:09d}.png")
                files.append(write_snapshot(
                    state, snap, u_factor=u_factor, nz_out=case.nz_out,
                    title=f"{case.vtk_prefix}{case.datetime} step {t}"))
        if (ckpt_path is not None and s.checkpoint_interval > 0
                and t % s.checkpoint_interval == 0 and t > resume_t):
            from .checkpoint import save_checkpoint

            save_checkpoint(ckpt_path, state, step=t, avg=avg,
                            avg_samples=avg_samples, probes=case.probes,
                            meta={"total_steps": total_steps},
                            fbc=(advance.get_fbc()
                                 if hasattr(advance, "get_fbc") else None))

    _sync(state)
    solver_seconds = time.perf_counter() - t0
    if avg_phase_t0 is not None and t > avg_phase_start_t:
        timing["avg_steps_per_second"] = (t - avg_phase_start_t) / max(
            time.perf_counter() - avg_phase_t0, 1e-9)
    timing["solver_seconds"] = solver_seconds
    timing["mlups"] = info.mlups()

    write_final_outputs(case, state, avg, avg_samples, t, files,
                        skip_raw_u=(last_unsteady_t == t))

    progress.done("Solving CFD", f"{t}/{total_steps} steps")
    return RunResult(state=state, avg=avg, total_steps=t,
                     solver_seconds=solver_seconds, files=files, timing=timing)


def write_final_outputs(case: SolverCase, state: LBMState,
                        avg: Optional[AvgState], avg_samples: int, t: int,
                        files: List[Path], *, skip_raw_u: bool = False,
                        ) -> List[Path]:
    """Finalize one case: transient u/rho[/T] VTKs, the `_avg` VTK with
    u_avg/rho_avg[/T_avg]/fluid + requested tke/TI/TLS, probe CSVs,
    transform.info (reference setup.cpp:4718-4798, 2513-2683).  Shared by
    the serial driver and the case-parallel batch runner (run/batch.py)."""
    s = case.settings
    u_factor = case.units.si_u(1.0)
    rho_factor = case.units.si_rho(1.0)
    dt_si = case.units.si_t(1)
    vtk_dir = case.parent / "RESULTS" / "vtk"
    raw_base = f"{case.vtk_prefix}{case.datetime}_raw_"

    def write_raw(name: str, data: np.ndarray, affine_T: bool = False):
        arr = _crop_y(np.asarray(data), case.ny_out)
        if affine_T:
            arr = arr * case.units.unit_K + case.units.unit_K_offset
        path = vtk_dir / vtk_timestep_name(raw_base + name, t)
        write_structured_points(
            path, {"data": arr.astype(np.float32)},
            spacing=case.cell_m, origin_shift=case.origin_shift,
            nz_write=case.nz_out)
        files.append(path)

    if not skip_raw_u:
        write_raw("u", np.asarray(state.u) * u_factor)
    write_raw("rho", np.asarray(state.rho) * rho_factor)
    if case.thermal_output and state.T is not None:
        write_raw("T", np.asarray(state.T), affine_T=True)

    if avg is not None and avg_samples > 0:
        mean_u = np.asarray(avg.mean_u)
        var_sum = np.asarray(variance_sum_u(avg))
        flags = np.asarray(state.flags)
        fields: Dict[str, np.ndarray] = {
            "u_avg": (mean_u * u_factor).astype(np.float32),
            "rho_avg": (np.asarray(avg.mean_rho) * rho_factor).astype(np.float32),
        }
        if case.thermal_output and avg.mean_T is not None:
            fields["T_avg"] = (np.asarray(avg.mean_T) * case.units.unit_K
                               + case.units.unit_K_offset).astype(np.float32)
        want = tuple(f.lower() for f in s.output_fields)
        derived = derived_turbulence_fields(
            mean_u, var_sum, flags, avg_count=avg_samples,
            u_factor=u_factor, spacing=case.cell_m, want=want)
        fields["fluid"] = derived.pop("fluid")
        # tke written in SI already by derived (uses u_factor)
        for key in ("tke", "TI", "TLS"):
            if key in derived and key.lower() in want:
                fields[key] = derived[key]
        fields = {k: _crop_y(v, case.ny_out) for k, v in fields.items()}
        avg_path = vtk_dir / vtk_timestep_name(
            f"{case.vtk_prefix}{case.datetime}_avg", t)
        write_structured_points(avg_path, fields, spacing=case.cell_m,
                                origin_shift=case.origin_shift, nz_write=case.nz_out)
        files.append(avg_path)

    results_dir = case.parent / "RESULTS"
    for p in case.probes:
        files.append(p.write_csv(results_dir))

    if s.research_output > 0:
        info_path = case.parent / "proj_temp" / "transform.info"
        info_path.parent.mkdir(parents=True, exist_ok=True)
        info_path.write_text(f"dt = {dt_si:.10f}s\n")
        files.append(info_path)
    return files

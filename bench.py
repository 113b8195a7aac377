"""Headline benchmark: D3Q19 FP16-storage MLUPs on one TPU chip.

Measures the flagship fused step (SRT + Smagorinsky LES + equilibrium
boundaries — the configuration LUW actually runs, reference defines.hpp) on
the largest cubic-ish grid that fits, and prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "MLUPs", "vs_baseline": ...}

Baseline: 2000 MLUPs/chip (BASELINE.json target floor).
vs_baseline = measured / 2000.

`bench.py --mesh [Dx,Dy,Dz]` runs the weak-scaling harness instead: the
sharded Pallas tier over all visible devices (default z-slab split), with a
fixed per-chip subdomain, reporting aggregate + per-chip MLUPs and the halo
traffic per step (docs/SCALING.md records the pod projection).

Env overrides: LUW_BENCH_SHAPE="Z,Y,X", LUW_BENCH_STEPS, LUW_BENCH_STORAGE,
LUW_BENCH_IMPL=reference|pallas.  The default run also measures the
reference's default FP16C storage and reports it as "fp16c_mlups" in the
same JSON line (disable with LUW_BENCH_ALT=none).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_MLUPS = 2000.0


def _supervise() -> int:
    """Outage guard: the hosted-TPU tunnel can wedge so that backend init
    blocks forever inside the PJRT client C call (no SIGALRM, no GIL).  The
    bench therefore runs as a CHILD process while this supervisor watches a
    sentinel file the child touches once `jax.devices()` returns.  If the
    sentinel does not appear within LUW_BENCH_INIT_TIMEOUT seconds (default
    600) the supervisor kills the child, prints the one-line error JSON
    itself, and exits 0 — a parseable outage report, not an rc=137 crash.
    Once init succeeds the bench may run as long as it likes."""
    import secrets
    import signal
    import subprocess

    timeout = int(os.environ.get("LUW_BENCH_INIT_TIMEOUT", "600"))
    sentinel = f"/tmp/luw_bench_ok_{os.getpid()}_{secrets.token_hex(4)}"
    env = dict(os.environ)
    env["LUW_BENCH_WORKER"] = "1"
    env["LUW_BENCH_SENTINEL"] = sentinel
    child = subprocess.Popen([sys.executable] + sys.argv, env=env)
    try:
        deadline = time.monotonic() + timeout
        while timeout > 0 and not os.path.exists(sentinel):
            if child.poll() is not None:
                return child.returncode  # died before init: real failure
            if time.monotonic() >= deadline:
                child.send_signal(signal.SIGKILL)
                child.wait()
                print(json.dumps({
                    "metric": "D3Q19 MLUPs/chip",
                    "value": 0.0,
                    "unit": "MLUPs",
                    "vs_baseline": 0.0,
                    "error": f"accelerator backend init exceeded {timeout}s "
                             "(TPU tunnel unreachable?)",
                    "note": "infrastructure outage, not a code failure — "
                            "see README Status / docs/SCALING.md for the "
                            "last healthy measurements",
                }))
                sys.stdout.flush()
                return 0
            time.sleep(0.5)
        return child.wait()
    finally:
        try:
            os.remove(sentinel)
        except OSError:
            pass


def _mark_init_ok() -> None:
    """Child side: tell the supervisor backend init completed."""
    sentinel = os.environ.get("LUW_BENCH_SENTINEL")
    if sentinel:
        with open(sentinel, "w"):
            pass


def parse_shape() -> tuple:
    raw = os.environ.get("LUW_BENCH_SHAPE")
    if raw:
        z, y, x = (int(v) for v in raw.split(","))
        return z, y, x
    return 256, 256, 256


def measure(storage: str, shape: tuple, steps: int, reps: int,
            impl: str) -> tuple:
    """One storage variant's MLUPs on the flagship configuration."""
    import jax
    import jax.numpy as jnp

    from latticeurbanwind_tpu.lbm import (
        DynParams, StepConfig, TYPE_E, TYPE_S,
        equilibrium_state, omega_from_nu,
    )
    from latticeurbanwind_tpu.lbm.stepper import make_bench_runner

    Z, Y, X = shape
    n_cells = Z * Y * X
    config = StepConfig(omega=omega_from_nu(1e-4), collision="srt",
                        subgrid=True, storage=storage,
                        volume_force=False)  # vanilla benchmark: the
    # reference's headline config compiles without VOLUME_FORCE
    # (defines.hpp); production urban runs keep forcing on

    # urban-run-shaped case: ground solid, lateral+top equilibrium boundaries.
    # Built entirely in-trace: through the hosted TPU tunnel a host-side init
    # would pay minutes of numpy + a ~38 B/cell upload at 100M+ cells.
    def build_state():
        flags = jnp.zeros(shape, jnp.uint8)
        flags = flags.at[0].set(TYPE_S)
        flags = flags.at[-1].set(TYPE_E)
        flags = flags.at[:, 0, :].set(TYPE_E)
        flags = flags.at[:, -1, :].set(TYPE_E)
        flags = flags.at[:, :, 0].set(TYPE_E)
        flags = flags.at[:, :, -1].set(TYPE_E)
        u = jnp.zeros((3, Z, Y, X), jnp.float32).at[0].set(0.05)
        return equilibrium_state(shape, config=config, u=u, flags=flags)

    state = jax.jit(build_state)()
    dyn = DynParams(force=jnp.zeros(3), omega_coriolis=jnp.zeros(3))

    run, impl_used = make_bench_runner(config, shape=shape, n_inner=steps, impl=impl)

    def sync(s):
        # hard device->host readback of the DDF output (rho/u pass through
        # the pure-DDF tier untouched, so only fi proves the step ran);
        # block_until_ready is unreliable through the hosted TPU tunnel
        return float(jnp.asarray(s.fi[0, 1, 1, 1]).astype(jnp.float32))

    # warm-up / compile
    state = run(state, dyn, 0)
    sync(state)

    # best of N timed batches (the hosted tunnel adds per-call jitter)
    best = float("inf")
    t = steps
    for _ in range(max(1, reps)):
        t0 = time.perf_counter()
        state = run(state, dyn, t)
        sync(state)
        best = min(best, time.perf_counter() - t0)
        t += steps

    mlups = n_cells * steps / best / 1e6
    from latticeurbanwind_tpu.lbm import decode_ddf
    from latticeurbanwind_tpu.lbm.reference import moments

    # stability check on a central z-slab (full-grid update_fields would
    # need another f32 field set — OOM at 10^8 cells next to the live state)
    def slab_umax(s):
        _, u_s = moments(decode_ddf(s.fi[:, Z // 2:Z // 2 + 1], storage))
        return jnp.max(jnp.abs(u_s))

    umax = float(jax.jit(slab_umax)(state))
    assert np.isfinite(umax), "benchmark produced non-finite velocities"
    return mlups, impl_used


def main() -> None:
    import jax

    jax.devices()                 # backend init is the hang risk
    _mark_init_ok()
    shape = parse_shape()
    steps = int(os.environ.get("LUW_BENCH_STEPS", "200"))
    reps = int(os.environ.get("LUW_BENCH_REPS", "3"))
    storage = os.environ.get("LUW_BENCH_STORAGE", "bf16")
    impl = os.environ.get("LUW_BENCH_IMPL", "auto")
    Z, Y, X = shape

    mlups, impl_used = measure(storage, shape, steps, reps, impl)
    result = {
        "metric": f"D3Q19 {storage} MLUPs/chip ({impl_used}, {Z}x{Y}x{X}, LES+EQ-BC)",
        "value": round(mlups, 1),
        "unit": "MLUPs",
        "storage": storage,
        "vs_baseline": round(mlups / BASELINE_MLUPS, 3),
    }
    # storage-variant transparency: the headline is bf16 (the TPU-native
    # 2-byte format); also report the reference's default FP16C storage in
    # the same line so the floor comparison is precision-explicit.
    if "LUW_BENCH_STORAGE" not in os.environ and \
            os.environ.get("LUW_BENCH_ALT", "fp16c") not in ("", "none"):
        alt = os.environ.get("LUW_BENCH_ALT", "fp16c")
        alt_mlups, _ = measure(alt, shape, steps, max(1, reps - 1), impl)
        result[f"{alt}_mlups"] = round(alt_mlups, 1)
    print(json.dumps(result))


def main_mesh(split_arg: str = "") -> None:
    """Weak scaling over the visible devices: per-chip slab held constant."""
    import jax
    import jax.numpy as jnp

    jax.devices()
    _mark_init_ok()

    from latticeurbanwind_tpu.lbm import (
        DynParams, Forcing, StepConfig, TYPE_E, TYPE_S,
        equilibrium_state, omega_from_nu,
    )
    from latticeurbanwind_tpu.parallel import domain_mesh, shard_state
    from latticeurbanwind_tpu.parallel.halo import make_sharded_pallas_runner

    ndev = len(jax.devices())
    if split_arg:
        dx, dy, dz = (int(v) for v in split_arg.split(","))
    else:
        dx, dy, dz = 1, 1, ndev
    n = dx * dy * dz
    storage = os.environ.get("LUW_BENCH_STORAGE", "bf16")
    steps = int(os.environ.get("LUW_BENCH_STEPS", "50"))
    # per-chip slab (z-extent per shard kept constant = weak scaling)
    zl, Y, X = (int(v) for v in os.environ.get(
        "LUW_BENCH_LOCAL", "64,256,256").split(","))
    shape = (zl * dz, Y * dy, X * dx)
    Z = shape[0]
    config = StepConfig(omega=omega_from_nu(1e-4), subgrid=True, storage=storage,
                        volume_force=False)

    def build_state():
        flags = jnp.zeros(shape, jnp.uint8)
        flags = flags.at[0].set(TYPE_S)
        flags = flags.at[-1].set(TYPE_E)
        flags = flags.at[:, 0, :].set(TYPE_E)
        flags = flags.at[:, -1, :].set(TYPE_E)
        flags = flags.at[:, :, 0].set(TYPE_E)
        flags = flags.at[:, :, -1].set(TYPE_E)
        u = jnp.zeros((3, *shape), jnp.float32).at[0].set(0.05)
        return equilibrium_state(shape, config=config, u=u, flags=flags)

    state = jax.jit(build_state)()
    dyn = DynParams(force=jnp.zeros(3), omega_coriolis=jnp.zeros(3))
    mesh = domain_mesh((dx, dy, dz))
    run = make_sharded_pallas_runner(config, Forcing(), shape, mesh,
                                     init_u=state.u, init_T=None)
    state = shard_state(state, mesh)
    state = run(state, dyn, 0, 1)
    _ = np.asarray(state.fi[0, 1, 1, 1])
    best = float("inf")
    for _i in range(2):
        t0 = time.perf_counter()
        state = run(state, dyn, 0, steps)
        _ = np.asarray(state.fi[0, 1, 1, 1])
        best = min(best, time.perf_counter() - t0)
    cells = int(np.prod(shape))
    mlups = cells * steps / best / 1e6
    halo_bytes = 2 * (5 * Y * X * dz * (dy * dx) * 2
                      + (5 * Z * X * (dy - 1) * dx + 5 * Z * Y * (dx - 1) * dy) * 2)
    print(json.dumps({
        "metric": f"weak-scaling D3Q19 {storage} ({dx}x{dy}x{dz} mesh, "
                  f"{zl}x{Y}x{X}/chip)",
        "value": round(mlups, 1),
        "unit": "MLUPs",
        "per_chip": round(mlups / n, 1),
        "halo_bytes_per_step": halo_bytes,
        "vs_baseline": round(mlups / n / BASELINE_MLUPS, 3),
    }))


if __name__ == "__main__":
    if os.environ.get("LUW_BENCH_WORKER") != "1" and \
            int(os.environ.get("LUW_BENCH_INIT_TIMEOUT", "600")) > 0:
        sys.exit(_supervise())
    if "--mesh" in sys.argv:
        i = sys.argv.index("--mesh")
        arg = sys.argv[i + 1] if len(sys.argv) > i + 1 else ""
        main_mesh(arg if "," in arg else "")
    else:
        main()

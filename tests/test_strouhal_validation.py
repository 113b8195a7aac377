"""Unsteady validation: von Kármán vortex street behind a circular
cylinder at Re = 100.

The AIJ/urban use case is inherently unsteady (vortex shedding off
building corners drives pedestrian-level gusts); the steady benchmarks
(Poiseuille, cavity) cannot catch errors in the time dynamics.  The
classic check is the shedding Strouhal number St = f D / U: experiments
give ~0.164 at Re = 100 (Williamson 1989); confined/blockage simulations
report 0.16-0.18.  This runs a thin-slab (z-periodic) cylinder in
crossflow on the jnp reference tier and measures St from the dominant
frequency of the cross-stream velocity behind the cylinder.
"""

import numpy as np


def test_vortex_street_strouhal_re100():
    import jax
    import jax.numpy as jnp

    from latticeurbanwind_tpu.lbm import (
        DynParams, Forcing, StepConfig, TYPE_E, TYPE_S,
        make_initial_state, omega_from_nu,
    )
    from latticeurbanwind_tpu.lbm.reference import make_step

    Z, Y, X = 3, 100, 250
    D = 10
    u0 = 0.1
    nu = u0 * D / 100.0                     # Re = 100
    cfg = StepConfig(omega=omega_from_nu(nu), subgrid=False, storage="f32")

    cx, cy = X // 4, Y // 2
    yy, xx = np.mgrid[0:Y, 0:X]
    cyl = (xx - cx) ** 2 + (yy - cy) ** 2 <= (D / 2) ** 2
    flags = np.zeros((Z, Y, X), np.uint8)
    flags[:, cyl] = TYPE_S
    flags[:, :, 0] |= TYPE_E               # inflow
    flags[:, :, -1] |= TYPE_E              # outflow (EQ at u0)
    flags[:, 0, :] |= TYPE_E               # free-slip-ish far lateral
    flags[:, -1, :] |= TYPE_E
    u = np.zeros((3, Z, Y, X), np.float32)
    u[0] = u0
    u[1, :, : Y // 2, :] = 0.004           # asymmetry to trigger shedding
    u[:, :, cyl] = 0.0
    state = make_initial_state((Z, Y, X), config=cfg, u=u, flags=flags)
    step = make_step(cfg, Forcing())
    dyn = DynParams(force=jnp.zeros(3), omega_coriolis=jnp.zeros(3))

    SAMPLE = 50                            # steps between probe samples

    @jax.jit
    def chunk(s):
        return jax.lax.fori_loop(0, SAMPLE, lambda i, st: step(st, dyn), s)

    px, py = cx + 3 * D, cy                # wake probe 3 diameters behind
    vs = []
    for _ in range(240):                   # 12 000 steps ≈ 20 periods
        state = chunk(state)
        vs.append(float(state.u[1, 1, py, px]))
    sig = np.asarray(vs)[96:]              # discard the growth transient
    assert np.abs(sig).max() > 0.2 * u0, "no vortex shedding developed"
    sig = sig - sig.mean()
    freqs = np.fft.rfftfreq(len(sig), d=float(SAMPLE))
    amp = np.abs(np.fft.rfft(sig))
    f_peak = freqs[1 + int(np.argmax(amp[1:]))]
    st = f_peak * D / u0
    # 0.164 (Williamson 1989) +- blockage (~10% here) and the FFT bin width
    assert 0.14 <= st <= 0.19, f"Strouhal {st:.3f} outside Re=100 band"

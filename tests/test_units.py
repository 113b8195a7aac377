"""Units conversion round-trips and the LUW anchoring recipe."""

import math

from latticeurbanwind_tpu.units import Units


def test_si_lattice_round_trip():
    u = Units()
    u.set_m_kg_s(x=1.0, u=0.1, rho=1.0, si_x=20.0, si_u=8.0, si_rho=1.225)
    assert math.isclose(u.si_x(u.x(123.0)), 123.0, rel_tol=1e-12)
    assert math.isclose(u.si_u(u.u(8.0)), 8.0, rel_tol=1e-12)
    assert math.isclose(u.si_nu(u.nu(1.48e-5)), 1.48e-5, rel_tol=1e-12)
    assert math.isclose(u.si_rho(u.rho(1.225)), 1.225, rel_tol=1e-12)
    # the LUW anchor: lbm_ref_u=0.10 at si_ref_u -> dt = cell_m * 0.1 / si_ref_u
    assert math.isclose(u.si_t(1), 20.0 * 0.1 / 8.0, rel_tol=1e-12)


def test_affine_temperature_map():
    u = Units()
    u.set_m_kg_s_K(x=1.0, u=0.1, rho=1.0, T=1.0, si_x=10.0, si_u=5.0,
                   si_rho=1.225, si_T=20.0)
    u.set_temperature_reference(1.0, 293.15)
    assert math.isclose(u.si_T(1.0), 293.15, rel_tol=1e-12)
    assert math.isclose(u.T(293.15), 1.0, rel_tol=1e-12)
    assert math.isclose(u.si_T(u.T(310.0)), 310.0, rel_tol=1e-9)
    # temperature differences ignore the offset
    assert math.isclose(u.si_dT(u.dT(7.0)), 7.0, rel_tol=1e-12)


def test_dimensionless_helpers():
    assert math.isclose(Units.nu_from_tau(0.8), 0.1, rel_tol=1e-12)
    assert math.isclose(Units.Ma(0.57735027), 1.0, rel_tol=1e-6)
    assert math.isclose(Units.rho_from_p(Units.p_from_rho(1.23)), 1.23, rel_tol=1e-12)

@echo off
setlocal EnableExtensions EnableDelayedExpansion
rem LatticeUrbanWind-TPU installer (Windows).  Same staged contract as
rem install_linux.sh, driven through PowerShell-free cmd so it runs on a
rem stock box: env detection, PATH setup, dependency check, native-helper
rem compile (optional — numpy fallbacks cover a missing compiler), solver
rem smoke test.  (reference: install_win.cmd — staged orchestrator; no
rem elevation needed here: nothing touches system state outside LUW_HOME.)

set "SCRIPT_DIR=%~dp0"
pushd "%SCRIPT_DIR%" || (echo cannot enter %SCRIPT_DIR% & exit /b 1)
set "LUW_HOME=%SCRIPT_DIR:~0,-1%"
set "EXITCODE=0"

where python >nul 2>&1
if errorlevel 1 (
  echo [0/4] python not found on PATH — install Python 3.10+ first.
  set "EXITCODE=1"
  goto summary
)

echo [0/4] Environment detection
set "PYTHONPATH=%LUW_HOME%;%PYTHONPATH%"
python -m latticeurbanwind_tpu.cli.dispatch luwenv
if errorlevel 1 set "EXITCODE=1"

echo [1/4] Wiring LUW_HOME + PATH for the current user
setx LUW_HOME "%LUW_HOME%" >nul
setx PATH "%PATH%;%LUW_HOME%\bin" >nul
echo     LUW_HOME = %LUW_HOME%
echo     bin\*.ps1 wrappers are now reachable from new shells.

echo [2/4] Python dependency check
python -c "import jax, numpy, scipy; print('jax', jax.__version__)"
if errorlevel 1 (
  echo     missing deps — run: pip install jax numpy scipy
  set "EXITCODE=1"
)

echo [3/4] Native helpers (optional)
where g++ >nul 2>&1
if errorlevel 1 (
  echo     no g++ on PATH — skipping; numpy fallbacks serve all native paths.
) else (
  python -c "import sys; sys.path.insert(0, r'%LUW_HOME%'); from latticeurbanwind_tpu.utils import native; print('native helpers:', 'built' if native.load() else 'unavailable (numpy fallbacks active)')"
)

echo [4/4] Solver smoke test (real LBM steps, like installer/4_testrun.sh)
python -c "import sys; sys.path.insert(0, r'%LUW_HOME%'); from latticeurbanwind_tpu.lbm import StepConfig, make_initial_state, omega_from_nu; from latticeurbanwind_tpu.lbm.reference import make_step; from latticeurbanwind_tpu.lbm.state import DynParams; import jax, jax.numpy as jnp; cfg=StepConfig(omega=omega_from_nu(0.05)); st=make_initial_state((8,8,8), config=cfg); dyn=DynParams(force=jnp.zeros(3), omega_coriolis=jnp.zeros(3)); out=jax.jit(make_step(cfg))(st, dyn); print('smoke test OK, rho mean', float(out.rho.mean()))"
if errorlevel 1 set "EXITCODE=1"

:summary
echo.
if "%EXITCODE%"=="0" (echo ---- install OK ----) else (echo ---- install finished with errors ----)
popd
exit /b %EXITCODE%

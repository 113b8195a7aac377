# LUW CLI wrapper (Windows): resolves LUW_HOME (repo root) and dispatches to
# the latticeurbanwind_tpu Python entry point.  (reference: bin/*.ps1)
$ErrorActionPreference = "Stop"
if (-not $env:LUW_HOME) {
    $env:LUW_HOME = (Resolve-Path (Join-Path $PSScriptRoot "..")).Path
}
$py = if ($env:LUW_PYTHON) { $env:LUW_PYTHON }
       elseif ($env:PYTHON) { $env:PYTHON } else { "python" }
$env:PYTHONPATH = if ($env:PYTHONPATH) {
    "$($env:LUW_HOME);$($env:PYTHONPATH)"
} else { $env:LUW_HOME }
& $py -m latticeurbanwind_tpu.cli.dispatch dgprepare @args
exit $LASTEXITCODE

#!/usr/bin/env bash
# Stage 1: shell environment (reference: installer/1_env_var.sh).
# Appends LUW_HOME and the bin/ directory to ~/.bashrc (idempotent).
set -u
LUW_HOME=$(cd "$(dirname "$0")/.." && pwd)
RC="$HOME/.bashrc"
MARK="# >>> latticeurbanwind_tpu >>>"
if ! grep -qF "$MARK" "$RC" 2>/dev/null; then
  {
    echo "$MARK"
    echo "export LUW_HOME=\"$LUW_HOME\""
    echo "export PATH=\"\$LUW_HOME/bin:\$PATH\""
    echo "export PYTHONPATH=\"\$LUW_HOME\${PYTHONPATH:+:\$PYTHONPATH}\""
    echo "# <<< latticeurbanwind_tpu <<<"
  } >> "$RC"
  echo "added LUW_HOME to $RC"
else
  echo "LUW_HOME already configured in $RC"
fi

#!/bin/bash
# Test gate (mirror of the reference's bin/runtests.sh: pytest + static
# typing as first-class checks, /root/reference/bin/runtests.sh:3-5).
set -e
cd "$(dirname "$0")/.."

python -m pytest tests/ -x -q

# Static typing GATE (reference treats mypy as a first-class check).
# Skips only when mypy is not installed (e.g. hermetic TPU images);
# CI always installs it, so typing regressions fail the build.
if python -c "import mypy" 2>/dev/null; then
    python -m mypy admmsolver_tpu --ignore-missing-imports \
        --no-strict-optional --allow-redefinition
else
    echo "mypy not installed; typing gate skipped (CI runs it)"
fi

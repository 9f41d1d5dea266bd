#!/bin/bash
# Test gate (mirror of the reference's bin/runtests.sh: pytest + static
# typing as first-class checks, /root/reference/bin/runtests.sh:3-5).
set -e
cd "$(dirname "$0")/.."

python -m pytest tests/ -x -q

# static typing gate (non-strict: jax's dynamism keeps this advisory)
if python -c "import mypy" 2>/dev/null; then
    python -m mypy admmsolver_tpu --ignore-missing-imports \
        --no-strict-optional --allow-redefinition || true
fi

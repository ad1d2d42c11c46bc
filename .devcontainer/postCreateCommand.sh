#!/usr/bin/env bash
# One-time container setup: git conveniences + editable install + a smoke
# test that the JAX backend (TPU if attached, else CPU) is alive.
set -e

git config --global safe.directory '*'
git config --global core.editor "code --wait"
git config --global pager.branch false

python3 -m pip install --user -e .

# Which backend did we get? On a TPU VM this prints TpuDevice(...)s; on a
# laptop it prints CPU devices and the test suite still runs (kernels fall
# back to their XLA references off-TPU).
python3 - <<'EOF'
import jax
print("jax", jax.__version__, "devices:", jax.devices())
EOF

# Fast signal that the checkout is healthy.
python3 -m pytest tests/ -x -q --collect-only >/dev/null && \
    echo "test collection OK - run: python -m pytest tests/ -x -q"

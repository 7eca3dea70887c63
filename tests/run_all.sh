#!/usr/bin/env bash
# Full hermetic suite in timeout-friendly chunks (the whole run is ~25 min
# on one CPU; single invocations of everything can exceed 10-minute CI
# timeouts). Fast tier first for quick signal.
set -e
cd "$(dirname "$0")/.."
# The suite is hermetic CPU-only; skip axon TPU-plugin registration so a
# wedged device tunnel can never hang backend init (sitecustomize.py
# registers only when PALLAS_AXON_POOL_IPS is set).
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
python -m pytest tests/ -m "not slow" -q          # ~2.5 min
python -m pytest tests/test_[a-o]*.py -m slow -q  # ~5 min
python -m pytest tests/test_p*.py -m slow -q      # ~7 min (parallel/pipeline)
python -m pytest tests/test_[q-z]*.py -m slow -q  # ~8 min
echo "full suite green"

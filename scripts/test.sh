#!/usr/bin/env bash
# Run the test suite on the virtual 8-device CPU mesh.
# PALLAS_AXON_POOL_IPS= skips the TPU tunnel registration in sitecustomize
# (which otherwise serializes / deadlocks concurrent python processes).
set -euo pipefail
cd "$(dirname "$0")/.."
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ "$@"

#!/usr/bin/env bash
# End-of-round / pre-snapshot gate (VERDICT r2 next #4: never ship a
# snapshot on a red suite).  Runs the full CPU suite and the multi-chip
# dryrun; exits nonzero on any failure.  Run it BEFORE any snapshot
# commit and record the result in the commit body.
#
# --fast: inner-loop mode — the curated <90 s smoke tier (pytest -m fast)
# instead of the ~9 min full suite.  The full run remains the snapshot
# gate; --fast is for iterating.
set -euo pipefail
cd "$(dirname "$0")/.."

MARK=()
LABEL="full test suite"
if [[ "${1:-}" == "--fast" ]]; then
    MARK=(-m fast)
    LABEL="fast smoke tier"
fi

echo "== ${LABEL} (CPU, 8 virtual devices) =="
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest tests/ -q "${MARK[@]}"

echo "== multi-chip dryrun (adversarial power-law graph) =="
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "PREFLIGHT PASS"

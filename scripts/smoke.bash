#!/usr/bin/env bash
# Mandatory pre-commit smoke gate (<60 s on the 1-core bench box).
#
# The full "fast" lane takes >10 minutes on this host and therefore cannot
# gate commits (that's how the 03eb66e regression reached main).  This set
# deliberately contains NO model-compile tests: pure-numpy ops/evals
# contracts, artifact-routing predicates, and the convert-CLI round trip.
# The native-loader wall-clock speedup assertion is deselected here (it is
# load-sensitive; a contended box must not flake the commit gate) — it
# still runs in the full lane, and the measured number lands in BENCH.
#
# Usage:   bash scripts/smoke.bash
# Full lane (run before ending a work session, not per commit):
#          python -m pytest tests/ -q -m "not slow"
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest -q \
  tests/test_ingestion_predicates.py \
  tests/test_ops_boxes.py \
  tests/test_ops_letterbox.py \
  tests/test_ops_nms.py \
  tests/test_ops_decode.py \
  tests/test_evals.py \
  tests/test_level0_evals.py \
  tests/test_small_tools.py \
  tests/test_native_loader.py \
  --deselect tests/test_native_loader.py::test_scaled_decode_speedup_on_large_source \
  "$@"

#!/usr/bin/env bash
# System preparation + launcher — the reference's run.bash analogue
# (reference: src/tt100k/pipeline/run.bash: drop caches, performance
# governor, swappiness, OMP/MKL/NCNN thread pins, PYTHONHASHSEED=0, launch).
#
# On a TPU host the CPU-side knobs that matter are the XLA flags and
# deterministic hashing; on-chip threading belongs to XLA.
set -euo pipefail

# deterministic host-side hashing (run.bash:42)
export PYTHONHASHSEED=0

# persistent compilation cache: repeat runs skip recompiles on hosts where
# compilation is local (remote-compile plugins manage their own cache)
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/litepi_jax}"

# donate host cores to input decode, not BLAS oversubscription
export OMP_NUM_THREADS="${OMP_NUM_THREADS:-1}"
export MKL_NUM_THREADS="${MKL_NUM_THREADS:-1}"
export OPENBLAS_NUM_THREADS="${OPENBLAS_NUM_THREADS:-1}"

REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${REPO_DIR}${PYTHONPATH:+:$PYTHONPATH}"

# build the native loader if the toolchain is present (best effort)
if command -v g++ >/dev/null && [ ! -f "${REPO_DIR}/native/liblitepi_loader.so" ]; then
  make -C "${REPO_DIR}/native" || echo "[run.bash] native loader build failed; cv2 fallback active"
fi

# default launch: the e2e evaluation CLI; pass through all arguments
exec python -m litepi_tpu.apps.e2e "$@"

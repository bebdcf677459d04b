"""2-process x 4-device mesh dryrun (jax.distributed + gloo collectives).

Everything DCN-shaped — per-process dataset sharding, global-batch assembly
from process-local arrays, MeshServer's local-feed serving, the multi-host
resume-promotion barrier — only exercises its real code path when
``jax.process_count() > 1``.  This spawns that topology for real and asserts
parity with the single-process run over the same 8-device mesh — served
outputs bitwise, all-reduced train scalars at 1e-6 relative (reduction
order is a topology choice; see litepi_tpu/parallel/multiprocess.py).
Reference: single-process by design
(SURVEY §2.4); this subsystem exists for TPU pods.
"""

import pytest

from litepi_tpu.parallel.multiprocess import run_multiprocess_dryrun

pytestmark = pytest.mark.slow


def test_two_process_mesh_bit_parity():
    result = run_multiprocess_dryrun(
        num_processes=2, devices_per_process=4, timeout=1400.0
    )
    assert result["processes"] == 2
    assert result["devices"] == 8
    assert result["loss"] > 0.0

"""Fast kernel-signature smoke: the full GCL step through every Pallas
kernel in interpret mode on CPU.

Exists because the production Mosaic kernels only compile on TPU; without
this, a kernel-signature regression (round 2's missing-ROWB bug in
pallas_radius.py) passes every CPU check and only explodes at TPU bench
time. Run before every snapshot: `pytest -m kernel_smoke -q`.
"""
import pytest

pytestmark = pytest.mark.kernel_smoke


def test_gcl_step_interpret_trace():
    """Trace-only: every Pallas dispatch site lowers with the production
    kernel signatures (the ROWB-class regression fails here in seconds)."""
    from gcl_tpu.testing import tiny_gcl_interpret_step

    assert tiny_gcl_interpret_step() is None


def test_kernel_exec_tiny():
    """Executed-kernel leg (~1 min): fused conv fwd/bwd, presence
    kernels, kernel maps and the windowed top-k run for real on tiny
    shapes, so index-math/OOB kernel bugs fail off-TPU too."""
    from gcl_tpu.testing import tiny_kernel_exec

    m = tiny_kernel_exec()
    assert m["n_groups"] > 0 and m["grad_norm"] > 0


@pytest.mark.slow
def test_gcl_step_interpret_execute():
    """Full compile+run of the interpret-mode step (minutes on CPU):
    catches index-math/out-of-bounds breakage the trace leg cannot."""
    from gcl_tpu.testing import tiny_gcl_interpret_step

    metrics = tiny_gcl_interpret_step(execute=True)
    assert float(metrics["num_valid_voxels"]) > 0
    assert float(metrics["num_groups"]) > 0

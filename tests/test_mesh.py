"""Mesh entry-point hardening (round-1 verdict item 2).

The reference's analog is the DDP world-size/batch-size handshake
(reference train.py:585-621): asking for more ranks than exist fails loudly
and total_batch_size must divide by world_size.
"""

import pytest

from multiyolov5_tpu.parallel.mesh import make_mesh, round_batch_for_devices


def test_make_mesh_too_many_devices_clear_error():
    with pytest.raises(ValueError, match="xla_force_host_platform_device_count"):
        make_mesh(64)


def test_make_mesh_zero_devices_clear_error():
    with pytest.raises(ValueError):
        make_mesh(0)


def test_make_mesh_ok():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8, 1)
    assert mesh.axis_names == ("data", "model")


def test_round_batch_for_devices():
    assert round_batch_for_devices(8, 1) == 8
    assert round_batch_for_devices(7, 8) == 8
    assert round_batch_for_devices(8, 8) == 8
    assert round_batch_for_devices(9, 8) == 16
    assert round_batch_for_devices(1, 8) == 8


def test_dryrun_child_guard_no_forkbomb(monkeypatch):
    """If a child process still can't see enough devices it must raise, not
    recurse (the subprocess sets _MULTIYOLOV5_DRYRUN_CHILD)."""
    import sys
    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.pop(0)
    monkeypatch.setenv("_MULTIYOLOV5_DRYRUN_CHILD", "1")
    # jax is already imported (conftest) with 8 cpu devices; ask for more
    # than exist so the "insufficient devices" branch is taken.
    with pytest.raises(RuntimeError, match="giving up"):
        ge.dryrun_multichip(512)

"""mesh_process_blocks: each process's (block_index, block_count) along
every mesh axis — the geometry kernel behind multi-host spatial/seq
batch assembly (round 4). Unit-tested against FAKE multi-process device
grids (the 2-process CLI integration lives in test_multihost.py)."""

from unittest import mock

import numpy as np
import pytest

from vsr_tpu.parallel.distributed import mesh_process_blocks


class _Dev:
    def __init__(self, pid):
        self.process_index = pid


class _FakeMesh:
    def __init__(self, grid, names):
        self.devices = np.asarray(grid, dtype=object)
        self.axis_names = names

    @property
    def shape(self):
        return dict(zip(self.axis_names, self.devices.shape))


def _patch(pidx, pcount=2):
    return (
        mock.patch("jax.process_index", return_value=pidx),
        mock.patch("jax.process_count", return_value=pcount),
    )


def _blocks(mesh, pidx, pcount):
    p1, p2 = _patch(pidx, pcount)
    with p1, p2:
        return mesh_process_blocks(mesh)


def test_leading_axis_spans_processes():
    # 2 procs x 2 local devices, mesh {'data': 2, 'seq': 2}: data spans.
    grid = [[_Dev(0), _Dev(0)], [_Dev(1), _Dev(1)]]
    mesh = _FakeMesh(grid, ("data", "seq"))
    assert _blocks(mesh, 0, 2) == {"data": (0, 2), "seq": (0, 1)}
    assert _blocks(mesh, 1, 2) == {"data": (1, 2), "seq": (0, 1)}


def test_four_processes_two_axes():
    # 4 procs x 1 device, {'data': 2, 'seq': 2}: both axes span.
    grid = [[_Dev(0), _Dev(1)], [_Dev(2), _Dev(3)]]
    mesh = _FakeMesh(grid, ("data", "seq"))
    assert _blocks(mesh, 0, 4) == {"data": (0, 2), "seq": (0, 2)}
    assert _blocks(mesh, 1, 4) == {"data": (0, 2), "seq": (1, 2)}
    assert _blocks(mesh, 2, 4) == {"data": (1, 2), "seq": (0, 2)}
    assert _blocks(mesh, 3, 4) == {"data": (1, 2), "seq": (1, 2)}


def test_single_axis_mesh():
    grid = [_Dev(0), _Dev(0), _Dev(1), _Dev(1)]
    mesh = _FakeMesh(grid, ("data",))
    assert _blocks(mesh, 1, 2) == {"data": (1, 2)}


def test_non_contiguous_block_rejected():
    # Process 0's devices interleaved along 'data' — no contiguous block.
    grid = [_Dev(0), _Dev(1), _Dev(0), _Dev(1)]
    mesh = _FakeMesh(grid, ("data",))
    with pytest.raises(ValueError, match="contiguous"):
        _blocks(mesh, 0, 2)


def test_diagonal_placement_rejected():
    # Per-axis projections look fine but the block is not cartesian.
    grid = [[_Dev(0), _Dev(1)], [_Dev(1), _Dev(0)]]
    mesh = _FakeMesh(grid, ("data", "seq"))
    with pytest.raises(ValueError, match="cartesian"):
        _blocks(mesh, 0, 2)


def test_process_without_devices_rejected():
    grid = [_Dev(0), _Dev(0)]
    mesh = _FakeMesh(grid, ("data",))
    with pytest.raises(ValueError, match="owns no devices"):
        _blocks(mesh, 1, 2)

"""Roofline/MFU accounting (savtpu/utils/roofline.py — VERDICT r4 #7).

The reference publishes no machine-efficiency numbers; these tests pin
the analytic flops/bytes models that bench.py turns into %-of-peak
fields, so a silent model regression cannot quietly inflate the
committed MFU claims.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from savtpu.config import Config
from savtpu.mesh import dirichlet_nodes
from savtpu.parallel import (
    ShardedProblem,
    build_partition_maps,
    partition_elements,
)
from savtpu.solvers import setup_problem
from savtpu.utils import roofline as rl


@pytest.fixture(scope="module")
def beam():
    cfg = Config()
    cfg.beam_cells = (12, 2, 2)
    cfg.beam_extent = (6.0, 1.0, 1.0)
    prob = setup_problem(cfg, dtype=jnp.float32)
    dnodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    return prob, dnodes


def _build(prob, dnodes, mode, pmethod, **kw):
    epart = partition_elements(prob.mesh.tetra, prob.mesh.points, 2, pmethod)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dnodes
    )
    return ShardedProblem.build(
        prob, maps, fint_mode=mode, dtype=jnp.float32, **kw
    )


def test_bytes_floor_dense_hand_count(beam):
    """Dense mode floor = 7 nodal arrays (plain carry) x P x DL x 4 B
    plus the streamed K operator, exactly."""
    prob, dnodes = beam
    sp = _build(prob, dnodes, "dense", "rcb")
    floor = rl.bytes_floor_per_step(sp)
    P, DL = sp.lM.shape
    assert floor["nodal_bytes"] == 7 * P * DL * 4
    assert floor["operator_bytes"] == int(np.prod(sp.denseK.shape)) * 4
    assert floor["bytes_per_step_floor"] == (
        floor["nodal_bytes"] + floor["operator_bytes"]
    )


def test_bytes_floor_compensated_adds_carry(beam):
    prob, dnodes = beam
    plain = rl.bytes_floor_per_step(_build(prob, dnodes, "dense", "rcb"))
    comp = rl.bytes_floor_per_step(
        _build(prob, dnodes, "dense", "rcb", compensated=True)
    )
    # (hi, lo, v) vs (d, v): +2 nodal arrays (1 extra carry, read+write)
    assert comp["carry_arrays"] == 3 and plain["carry_arrays"] == 2
    assert comp["nodal_bytes"] == plain["nodal_bytes"] * 9 / 7


def test_stencil_has_no_operator_stream(beam):
    """The baked-geometry stencil streams only nodal state — that IS the
    design point (gradients are host floats in the jaxpr)."""
    prob, dnodes = beam
    sp = _build(prob, dnodes, "stencil", "box")
    floor = rl.bytes_floor_per_step(sp)
    assert floor["operator_bytes"] == 0
    assert floor["bytes_per_step_floor"] < rl.bytes_floor_per_step(
        _build(prob, dnodes, "dense", "rcb")
    )["bytes_per_step_floor"]


def test_flops_model_dense_closed_form(beam):
    prob, dnodes = beam
    sp = _build(prob, dnodes, "dense", "rcb")
    fl = rl.flops_model(sp)
    assert fl["fint_flops_per_step"] == 2.0 * np.prod(sp.denseK.shape)
    P, DL = sp.lM.shape
    assert fl["update_flops_per_step"] == 7.0 * P * DL


def test_flops_model_stencil_counts_pruned_gradients(beam):
    """The stencil count replays the kernel's zero-pruning: it must be
    well below the no-pruning bound (all 12 gradient entries nonzero)
    and above a trivial lower bound."""
    prob, dnodes = beam
    sp = _build(prob, dnodes, "stencil", "box")
    fl = rl.flops_model(sp)
    per_cell_dense = rl._stencil_cell_flops(np.ones((6, 4, 3)), "linear")
    per_cell = rl._stencil_cell_flops(np.asarray(sp.nhs_G), "linear")
    assert 100 < per_cell < per_cell_dense
    NX, NY, NZ = sp.nhs_dims
    cells = (NX - 1) * (NY - 1) * (NZ - 1)
    P = sp.lM.shape[0]
    assert fl["fint_flops_per_step"] == P * cells * per_cell


def test_roofline_percentages():
    class FakeDev:
        device_kind = "TPU v5 lite"

    row = rl.roofline(
        1e6, bytes_per_step=81_900, flops_per_step=3_900, device=FakeDev()
    )
    # 81.9 GB/s of 819 GB/s peak = 10%; 3.9 GFLOP/s of 3.9 TF VPU = 0.1%
    assert row["pct_hbm_peak"] == pytest.approx(10.0)
    assert row["pct_vpu_peak_f32"] == pytest.approx(0.1)
    assert row["peaks"]["hbm_GBps"] == 819.0


def test_device_peaks_unknown_host_returns_none():
    class FakeDev:
        device_kind = "weird accelerator"

    assert rl.device_peaks(FakeDev()) is None

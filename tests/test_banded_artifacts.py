"""Artifact/device channel alignment under fint_mode='banded' (RCM).

ShardedProblem.build RCM-reorders the local DOF layout for the banded
F_int mode (parallel/halo.py: rcm_reorder_maps) and exposes the
reordered maps as sp.maps. Every artifact writer/reader (CSV labels,
stage-2 extraction, stage-3 channel order, plotter masks) must use THAT
map set — using the pre-reorder maps permutes the surrogate channels
against the device trajectory/sld layout. That exact mismatch (via
build_context passing stale maps into StageContext) produced the r2/r3
refined-mesh "accuracy plateau": a model-independent 6-10% global error
on every mesh big enough for auto to pick banded (docs/STATUS_r3.md).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax.numpy as jnp

from savtpu.config import Config
from savtpu.io.artifacts import ArtifactStore, load_displacement
from savtpu.pipeline import run_all
from savtpu.pipeline.common import build_context
from savtpu.pipeline.shared_extraction import shared_dof_indices


def _banded_cfg(tmp_path):
    from test_pipeline import _smoke_cfg

    cfg = _smoke_cfg(tmp_path, num_steps=100)
    # big enough that RCM is a nontrivial permutation, small enough to
    # stay a smoke test; force banded (auto only picks it past DL~1536)
    cfg.beam_cells = (10, 2, 2)
    cfg.beam_extent = (5.0, 1.0, 1.0)
    cfg.solver.fint_mode = "banded"
    return cfg


def test_context_maps_are_device_maps(tmp_path):
    cfg = _banded_cfg(tmp_path)
    ctx = build_context(cfg, dtype=jnp.float32)
    assert ctx.sp.fint_mode == "banded"
    assert ctx.maps is ctx.sp.maps
    # the reorder must actually permute something here, or this test is
    # vacuous: compare against a fresh pre-RCM map build
    from savtpu.mesh import dirichlet_nodes
    from savtpu.parallel import build_partition_maps, partition_elements

    epart = partition_elements(
        ctx.prob.mesh.tetra, ctx.prob.mesh.points,
        cfg.partition.n_parts, method=cfg.partition.method,
    )
    dn = dirichlet_nodes(ctx.prob.mesh.triangles, ctx.prob.mesh.points)
    pre = build_partition_maps(
        ctx.prob.mesh.tetra, epart, ctx.prob.mesh.num_points, dn
    )
    assert any(
        not np.array_equal(pre.local_nodes[p], ctx.maps.local_nodes[p])
        for p in range(cfg.partition.n_parts)
    ), "RCM was an identity permutation; grow the mesh"


def test_banded_extraction_matches_device_gather(tmp_path):
    """Stage-2 extraction of the saved trajectory must equal the device
    _gather_shared rows exactly — same run, same layout."""
    cfg = _banded_cfg(tmp_path)
    metrics = run_all.run(cfg, verbose=False)
    assert metrics is not None
    ctx = build_context(cfg, dtype=jnp.float32)
    sp, solver = ctx.sp, ctx.solver
    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())

    d0 = sp.localize(ctx.prob.d0)
    dn = sp.localize(ctx.prob.dn)
    n = cfg.solver.num_steps
    (_, shared), _ = solver.run(
        d0, dn, 0.0, n, sync=True, record="all", save_every=1
    )
    shared = np.asarray(shared)  # (P, n, S3) device order
    for r in range(cfg.partition.n_parts):
        local_nodes = store.load_int_csv(store.local_nodes_csv(r))
        shared_csv = store.load_int_csv(store.shared_csv(r))
        assert np.array_equal(local_nodes, ctx.maps.local_nodes[r])
        assert np.array_equal(shared_csv, ctx.maps.shared_nodes[r])
        rows = shared_dof_indices(local_nodes, shared_csv)
        # extraction indices == the device sld slots (channel alignment)
        sld = np.asarray(sp.sld[r])[: len(rows)]
        assert np.array_equal(rows, sld), r
        trace = load_displacement(store.shared_dof_h5(r))  # (D, T)
        dev = shared[r][:, : len(rows)]
        assert np.allclose(trace.T, dev, atol=1e-12), r


def test_banded_expfit_pipeline_matches_dense(tmp_path):
    """End-to-end canary: the banded-mode pipeline result must agree with
    the dense-mode pipeline on the identical configuration. The expfit
    surrogate is deterministic, so any gap beyond f32 scan noise is a
    layout/alignment bug (the permuted-channel bug gave a model-
    independent ~8% while dense was at the model's own accuracy)."""
    gs = {}
    for mode in ("dense", "banded"):
        cfg = _banded_cfg(tmp_path / mode)
        cfg.solver.num_steps = 400
        cfg.solver.fint_mode = mode
        s = cfg.surrogate
        s.arch = "expfit"
        s.expfit_order = 8
        s.modal_dim = 3
        s.pred_consensus = False
        metrics = run_all.run(cfg, verbose=False)
        gs[mode] = metrics["global_rel_l2_nonshared"]
    assert abs(gs["banded"] - gs["dense"]) < 0.2 * max(gs["dense"], 1e-3), gs

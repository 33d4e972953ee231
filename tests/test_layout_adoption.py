"""Artifact-layout adoption across stage reruns with mixed fint modes.

Stage 1 writes every per-rank artifact (label CSVs, Dynamics rows,
shared traces — hence trained model channels) in the local order its
build chose: box-lex for the stencil path, RCM for banded, first-touch
otherwise. A later stage built with a DIFFERENT fint_mode must adopt
the on-disk order instead of its own, or every channel is silently
permuted against the artifacts (measured 1.61% vs 0.008% rel-L2 at
384^3/256 in the round-4 head-to-head before the fix —
docs/STATUS_r4.md §8). Covers pipeline/common.py _load_artifact_layout
+ ShardedProblem.build(shared_order=...).
"""

import numpy as np

from savtpu.config import Config
from savtpu.io.artifacts import ArtifactStore, load_displacement
from savtpu.pipeline import (
    build_context,
    data_prepare,
    model_training,
    online_predictor,
    plotter,
    shared_extraction,
)


def _cfg(tmp_path, fint):
    cfg = Config()
    cfg.workdir = str(tmp_path / "Results")
    cfg.model_dir = str(tmp_path / "Distributed_save")
    cfg.beam_cells = (6, 1, 1)
    cfg.beam_extent = (6.0, 1.0, 1.0)
    cfg.partition.n_parts = 2
    cfg.solver.num_steps = 100
    cfg.solver.fint_mode = fint
    s = cfg.surrogate
    s.n_past = 4
    s.n_future = 4
    s.filter_size = 5
    s.cut_off = 0.5
    s.arch = "expfit"
    s.expfit_order = 4
    return cfg


def test_cross_fint_stage4_rerun(tmp_path):
    """Stages 1-3 on the stencil (box-lex) layout, stage 4 rebuilt with
    fint_mode='dense' (first-touch layout): the rerun must adopt the
    artifact order — warm-up rows must equal stage 1's exactly and the
    comm-free tail must stay at expfit accuracy, not permuted garbage."""
    cfg = _cfg(tmp_path, "stencil")
    data_prepare.run(cfg, verbose=False)
    shared_extraction.run(cfg)
    model_training.run(cfg, verbose=False)

    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    art_local = [store.load_int_csv(store.local_nodes_csv(r)) for r in (0, 1)]
    art_shared = [store.load_int_csv(store.shared_csv(r)) for r in (0, 1)]

    cfg4 = _cfg(tmp_path, "dense")
    ctx4 = build_context(cfg4)
    # the layouts genuinely differ (lex vs first-touch) or this test
    # would be vacuous
    assert any(
        not np.array_equal(np.asarray(ctx4.maps.local_nodes[r]), art_local[r])
        for r in (0, 1)
    )
    assert ctx4.artifact_local_perm is not None
    # shared CHANNEL order was adopted wholesale
    for r in (0, 1):
        np.testing.assert_array_equal(
            np.asarray(ctx4.maps.shared_nodes[r]), art_shared[r]
        )

    online_predictor.run(cfg4, ctx=ctx4, verbose=False)
    metrics = plotter.run(cfg4, start=30)

    n_sync = cfg.surrogate.i_cri + 1
    for r in (0, 1):
        exact = load_displacement(store.dynamics_h5(r))
        pred = load_displacement(store.modeled_h5(r))
        # synced warm-up reproduces stage 1 bit-for-bit IN ARTIFACT ORDER
        assert np.allclose(pred[:, :n_sync], exact[:, :n_sync], atol=1e-10)
        # labels were NOT clobbered by the rerun's own layout
        np.testing.assert_array_equal(
            store.load_int_csv(store.local_nodes_csv(r)), art_local[r]
        )
    assert metrics["global_rel_l2_nonshared"] < 0.05


def test_fresh_run_ignores_incompatible_labels(tmp_path):
    """Stale CSVs from a different partition must not be adopted — a
    fresh stage 1 just overwrites them."""
    cfg = _cfg(tmp_path, "dense")
    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    for r in (0, 1):  # garbage labels: wrong node sets
        store.save_int_csv(store.local_nodes_csv(r), np.arange(r, r + 5))
        store.save_int_csv(store.shared_csv(r), np.arange(r, r + 2))
    ctx = build_context(cfg)
    assert ctx.artifact_local_nodes is None
    assert ctx.artifact_local_perm is None

"""End-to-end pipeline test: all 5 stages on a scaled-down schedule
(small beam, n_p=n_f=4, n_s=5 -> 20 synced steps + 20-step comm-free
blocks), checking the artifact contract and that the hybrid trajectory
stays bounded. The full-size schedule runs in the benchmark, not in CI."""

import numpy as np
import pytest

from savtpu.config import Config
from savtpu.io.artifacts import ArtifactStore, load_displacement
from savtpu.pipeline import run_all


def _smoke_cfg(tmp_path, num_steps=100):
    cfg = Config()
    cfg.workdir = str(tmp_path / "Results")
    cfg.model_dir = str(tmp_path / "Distributed_save")
    cfg.beam_cells = (6, 1, 1)
    cfg.beam_extent = (6.0, 1.0, 1.0)
    cfg.partition.n_parts = 2
    cfg.solver.num_steps = num_steps
    s = cfg.surrogate
    s.n_past = 4
    s.n_future = 4
    s.filter_size = 5
    s.cut_off = 0.5
    s.batch_size = 2
    s.num_epochs = 40
    s.hidden_size = 8
    s.learning_rate = 2e-3
    return cfg


def test_pipeline_end_to_end(tmp_path):
    cfg = _smoke_cfg(tmp_path)
    metrics = run_all.run(cfg, verbose=False)

    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    # stage 1 artifacts
    for r in range(2):
        nodes = store.load_int_csv(store.local_nodes_csv(r))
        data = load_displacement(store.dynamics_h5(r))
        assert data.shape == (3 * len(nodes), cfg.solver.num_steps)
        shared = store.load_int_csv(store.shared_csv(r))
        assert len(shared) > 0
        # stage 2
        trace = load_displacement(store.shared_dof_h5(r))
        assert trace.shape == (3 * len(shared), cfg.solver.num_steps)
        # stage 3
        assert store.model_file(r).exists()
        assert store.model_run_dir(r).joinpath("train_loss.csv").exists()
        # stage 4
        pred = load_displacement(store.modeled_h5(r))
        assert pred.shape == data.shape
        assert np.isfinite(pred).all()
        # hybrid run stays the exact run during the synced warm-up
        n_sync = cfg.surrogate.i_cri + 1
        assert np.allclose(pred[:, :n_sync], data[:, :n_sync], atol=1e-10)
        # trajectory magnitude stays physical (no blow-up)
        assert np.abs(pred).max() < 10 * max(np.abs(data).max(), 1e-12)
    # stage 5
    assert (tmp_path / "Results" / "Comparison.pdf").exists()
    assert all(np.isfinite(v) for v in metrics.values()
               if isinstance(v, float))


def test_pipeline_partial_last_block(tmp_path):
    """num_steps not a multiple of the block size: the final comm-free
    block is truncated (reference's break at Online_predictor.py:286)."""
    cfg = _smoke_cfg(tmp_path, num_steps=90)  # 20 sync + 3x20 + 10
    run_all.run(cfg, verbose=False)
    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    pred = load_displacement(store.modeled_h5(0))
    assert pred.shape[1] == 90


def test_pipeline_stacked_training_4_parts(tmp_path):
    """4 spatial shards with stacked (single vmapped pass) surrogate
    training + padded-model online prediction."""
    cfg = _smoke_cfg(tmp_path)
    cfg.partition.n_parts = 4
    cfg.beam_cells = (8, 1, 1)
    cfg.beam_extent = (8.0, 1.0, 1.0)
    cfg.surrogate.stacked = True
    run_all.run(cfg, verbose=False)
    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    n_sync = cfg.surrogate.i_cri + 1
    for r in range(4):
        data = load_displacement(store.dynamics_h5(r))
        pred = load_displacement(store.modeled_h5(r))
        assert pred.shape == data.shape
        assert np.isfinite(pred).all()
        assert np.allclose(pred[:, :n_sync], data[:, :n_sync], atol=1e-10)
        import json
        meta = json.loads(store.model_file(r).with_suffix(".json").read_text())
        assert meta["padded_input"] is True


def test_pipeline_stacked_per_feature_scaling(tmp_path):
    """scale_mode='per_feature': per-DOF scaling constants flow through
    sidecar -> online loader -> stacked predictor; warm-up equality and
    finite predictions hold as with joint scaling."""
    cfg = _smoke_cfg(tmp_path)
    cfg.partition.n_parts = 2
    cfg.surrogate.stacked = True
    cfg.surrogate.scale_mode = "per_feature"
    run_all.run(cfg, verbose=False)
    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    n_sync = cfg.surrogate.i_cri + 1
    import json
    for r in range(2):
        data = load_displacement(store.dynamics_h5(r))
        pred = load_displacement(store.modeled_h5(r))
        assert np.isfinite(pred).all()
        assert np.allclose(pred[:, :n_sync], data[:, :n_sync], atol=1e-10)
        meta = json.loads(store.model_file(r).with_suffix(".json").read_text())
        assert meta["scale_mode"] == "per_feature"
        assert isinstance(meta["scale_max"], list)
        assert len(meta["scale_max"]) == meta["input_size"]


def test_stage1_under_device_mesh(tmp_path):
    """data_prepare with a real 4-device shard_map mesh produces the same
    artifacts as the single-device emulation."""
    import jax
    from savtpu.parallel import make_device_mesh
    from savtpu.pipeline import data_prepare
    from savtpu.pipeline.common import build_context

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs 4 virtual devices")

    cfg = _smoke_cfg(tmp_path / "emu", num_steps=60)
    cfg.partition.n_parts = 4
    cfg.beam_cells = (8, 1, 1)
    cfg.beam_extent = (8.0, 1.0, 1.0)
    ctx = build_context(cfg)
    data_prepare.run(cfg, ctx=ctx, verbose=False)

    cfg2 = _smoke_cfg(tmp_path / "mesh", num_steps=60)
    cfg2.partition.n_parts = 4
    cfg2.beam_cells = (8, 1, 1)
    cfg2.beam_extent = (8.0, 1.0, 1.0)
    ctx2 = build_context(cfg2, device_mesh=make_device_mesh(4))
    data_prepare.run(cfg2, ctx=ctx2, verbose=False)

    for r in range(4):
        a = load_displacement(
            ArtifactStore(cfg.workdir, cfg.model_dir, "x").dynamics_h5(r)
        )
        b = load_displacement(
            ArtifactStore(cfg2.workdir, cfg2.model_dir, "x").dynamics_h5(r)
        )
        assert np.allclose(a, b, atol=1e-12)


def test_stage4_fused_under_device_mesh(tmp_path):
    """The fused block-group scan (predictor + consensus + comm-free scan
    + history roll in ONE dispatch) must agree with the single-device
    emulation when run under a real 4-device shard_map mesh (VERDICT r2
    #4). pred_consensus=True exercises the once-per-block cross-shard
    psum inside the mapped body."""
    import jax
    from savtpu.parallel import make_device_mesh
    from savtpu.pipeline import online_predictor, run_all
    from savtpu.pipeline.common import build_context

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    cfg = _smoke_cfg(tmp_path)
    cfg.partition.n_parts = 4
    cfg.beam_cells = (8, 1, 1)
    cfg.beam_extent = (8.0, 1.0, 1.0)
    cfg.surrogate.stacked = True
    cfg.surrogate.pred_consensus = True
    run_all.run(cfg, verbose=False)  # stages 1-5, emulated stage 4
    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    emu = [np.array(load_displacement(store.modeled_h5(r)))
           for r in range(4)]

    ctx2 = build_context(cfg, device_mesh=make_device_mesh(4))
    assert ctx2.solver.mesh is not None
    online_predictor.run(cfg, ctx=ctx2, verbose=False)
    for r in range(4):
        mesh_out = load_displacement(store.modeled_h5(r))
        assert np.allclose(mesh_out, emu[r], atol=1e-12), r


@pytest.mark.parametrize("stacked", [True, False])
def test_pipeline_modal_surrogate(tmp_path, stacked):
    """modal_dim: surrogates trained on PCA mode coefficients; the online
    stage projects histories and reconstructs physical predictions, on
    both the stacked fast path and the per-rank fallback."""
    import json

    cfg = _smoke_cfg(tmp_path)
    cfg.surrogate.stacked = stacked
    cfg.surrogate.modal_dim = 3
    run_all.run(cfg, verbose=False)
    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    n_sync = cfg.surrogate.i_cri + 1
    for r in range(2):
        data = load_displacement(store.dynamics_h5(r))
        pred = load_displacement(store.modeled_h5(r))
        assert np.isfinite(pred).all()
        assert np.allclose(pred[:, :n_sync], data[:, :n_sync], atol=1e-10)
        assert np.abs(pred).max() < 10 * max(np.abs(data).max(), 1e-12)
        meta = json.loads(store.model_file(r).with_suffix(".json").read_text())
        assert meta["modal_dim"] == 3
        assert len(meta["modal_basis"]) == 3


@pytest.mark.parametrize("stacked", [True, False])
def test_pipeline_ensemble_surrogate(tmp_path, stacked):
    """ensemble=3: three independently seeded surrogates per rank trained
    in one widened stacked pass; the online stage averages member
    predictions (stacked fast path and per-rank fallback)."""
    import json

    cfg = _smoke_cfg(tmp_path)
    cfg.surrogate.stacked = True   # ensemble trains via the stacked pass
    cfg.surrogate.ensemble = 3
    cfg.surrogate.modal_dim = 0 if stacked else 3
    run_all.run(cfg, verbose=False)
    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    n_sync = cfg.surrogate.i_cri + 1
    for r in range(2):
        data = load_displacement(store.dynamics_h5(r))
        pred = load_displacement(store.modeled_h5(r))
        assert np.isfinite(pred).all()
        assert np.allclose(pred[:, :n_sync], data[:, :n_sync], atol=1e-10)
        assert np.abs(pred).max() < 10 * max(np.abs(data).max(), 1e-12)
        meta = json.loads(store.model_file(r).with_suffix(".json").read_text())
        assert meta["ensemble"] == 3


def test_ensemble_members_distinct_and_averaged(tmp_path):
    """Member params differ (independent seeds) and the stacked predictor
    returns the mean of per-member predictions."""
    import jax
    import jax.numpy as jnp

    from savtpu.pipeline import data_prepare, model_training, shared_extraction
    from savtpu.pipeline.online_predictor import load_rank_models
    from savtpu.pipeline.common import build_context
    from savtpu.models.predictor import phase_interleaved_predict_stacked

    cfg = _smoke_cfg(tmp_path)
    cfg.surrogate.stacked = True
    cfg.surrogate.ensemble = 2
    ctx = build_context(cfg)
    data_prepare.run(cfg, ctx=ctx, verbose=False)
    shared_extraction.run(cfg)
    model_training.run(cfg, verbose=False)
    models = load_rank_models(ctx)
    params, smax, smin, D_in, _, _, ens = models[0][:7]
    assert ens == 2
    m0 = jax.tree.map(lambda a: a[0], params)
    m1 = jax.tree.map(lambda a: a[1], params)
    diffs = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), m0, m1)
    )
    assert max(diffs) > 1e-6  # independently seeded members

    sur = cfg.surrogate
    W = sur.n_past * sur.filter_size
    rng = np.random.default_rng(0)
    hist = jnp.asarray(rng.normal(size=(1, W, D_in)), jnp.float32)
    sp = jax.tree.map(lambda a: jnp.asarray(a)[None], params)  # (1, E, ...)
    mx = jnp.asarray([models[0][1]], jnp.float32)
    mn = jnp.asarray([models[0][2]], jnp.float32)
    fm = jnp.ones((1, D_in), jnp.float32)

    from savtpu.pipeline.online_predictor import modal_predict_stacked

    avg = modal_predict_stacked(sp, hist, mx, mn, sur, None, fm, ens=2)
    singles = [
        phase_interleaved_predict_stacked(
            jax.tree.map(lambda a: jnp.asarray(a)[None], m),
            hist, mx, mn, sur.n_past, sur.n_future, sur.filter_size,
            feat_mask=fm,
        )
        for m in (m0, m1)
    ]
    np.testing.assert_allclose(
        np.asarray(avg), np.asarray((singles[0] + singles[1]) / 2),
        rtol=0, atol=1e-6,
    )


def test_modal_basis_roundtrip():
    """A spatially low-rank trace reconstructs through its modal basis to
    numerical precision."""
    from savtpu.models.modal import from_modal, modal_basis, to_modal

    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, 300)
    shapes = rng.normal(size=(2, 24))
    trace = (
        np.sin(2 * np.pi * t)[:, None] * shapes[0]
        + 0.3 * np.cos(6 * np.pi * t)[:, None] * shapes[1]
        + 0.5
    )
    mu, basis = modal_basis(trace, 2)
    rec = from_modal(to_modal(trace, mu, basis), mu, basis)
    assert np.allclose(rec, trace, atol=1e-10)


def test_pred_anchor_fixed_point():
    """pred_anchor's exchanged-step de-bias is a no-op on exact
    predictions: anchor = the true next shared row, so delta == 0 and the
    perfect-prediction identity is preserved."""
    import jax.numpy as jnp

    from savtpu.mesh import dirichlet_nodes
    from savtpu.parallel import (
        ShardedProblem, build_partition_maps, partition_elements,
    )
    from savtpu.parallel.sharded import ShardedSolver
    from savtpu.pipeline.online_predictor import anchor_block
    from savtpu.solvers import setup_problem

    cfg = Config()
    cfg.beam_cells = (8, 1, 1)
    cfg.beam_extent = (8.0, 1.0, 1.0)
    prob = setup_problem(cfg)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, 2, method="rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    sp = ShardedProblem.build(prob, maps, fint_mode="dense")
    solver = ShardedSolver(sp, mesh=None)
    d0, dn = sp.localize(prob.d0), sp.localize(prob.dn)
    (_, _), carry0 = solver.run(d0, dn, 0.0, 10, sync=True, record="none")
    (_, true_rows), _ = solver.run(*carry0, 20, sync=True, record="shared")
    out = anchor_block(sp, carry0, jnp.asarray(true_rows))
    assert np.allclose(np.asarray(out), np.asarray(true_rows), atol=1e-14)


def test_pipeline_pred_anchor(tmp_path):
    """End-to-end smoke with per-block exchanged anchoring on: warm-up
    equality and bounded trajectories hold."""
    cfg = _smoke_cfg(tmp_path)
    cfg.surrogate.stacked = True
    cfg.surrogate.pred_anchor = True
    run_all.run(cfg, verbose=False)
    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    n_sync = cfg.surrogate.i_cri + 1
    for r in range(2):
        data = load_displacement(store.dynamics_h5(r))
        pred = load_displacement(store.modeled_h5(r))
        assert np.isfinite(pred).all()
        assert np.allclose(pred[:, :n_sync], data[:, :n_sync], atol=1e-10)
        assert np.abs(pred).max() < 10 * max(np.abs(data).max(), 1e-12)


def test_stage1_kill_and_resume(tmp_path):
    """cfg.solver.ckpt_every: a stage-1 run killed mid-solve resumes from
    the last checkpoint and produces bit-identical HDF5 artifacts
    (VERDICT r2 #7)."""
    from savtpu.pipeline import data_prepare
    from savtpu.pipeline.common import build_context

    cfg = _smoke_cfg(tmp_path / "a", num_steps=100)
    cfg.solver.ckpt_every = 40
    data_prepare.run(cfg, ctx=build_context(cfg), verbose=False)
    store_a = ArtifactStore(cfg.workdir, cfg.model_dir, "x")
    ref = [np.array(load_displacement(store_a.dynamics_h5(r)))
           for r in range(2)]

    cfg2 = _smoke_cfg(tmp_path / "b", num_steps=100)
    cfg2.solver.ckpt_every = 40
    ctx2 = build_context(cfg2)
    orig_run = ctx2.solver.run
    calls = {"n": 0}

    def crashing(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected kill")
        return orig_run(*a, **k)

    ctx2.solver.run = crashing
    with pytest.raises(RuntimeError, match="injected kill"):
        data_prepare.run(cfg2, ctx=ctx2, verbose=False)
    store_b = ArtifactStore(cfg2.workdir, cfg2.model_dir, "x")
    assert (store_b.ckpt_dir("stage1") / "state.npz").exists()

    ctx2.solver.run = orig_run
    data_prepare.run(cfg2, ctx=ctx2, verbose=False)  # resumes at step 40
    for r in range(2):
        out = load_displacement(store_b.dynamics_h5(r))
        assert np.array_equal(np.array(out), ref[r]), r
    # checkpoint removed once artifacts are complete
    assert not (store_b.ckpt_dir("stage1") / "state.npz").exists()


def test_stage4_kill_and_resume(tmp_path, monkeypatch):
    """Stage 4 checkpoints at block-group boundaries; a killed hybrid run
    resumes (carry + rolling history + resync counters restored) and
    produces bit-identical modeled HDF5 artifacts."""
    import savtpu.pipeline.online_predictor as op
    from savtpu.pipeline.common import build_context

    cfg = _smoke_cfg(tmp_path)
    cfg.surrogate.stacked = True
    cfg.surrogate.resync_blocks = 2  # forces GROUP=2 -> >=2 checkpoints
    run_all.run(cfg, verbose=False)
    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    ref = [np.array(load_displacement(store.modeled_h5(r)))
           for r in range(2)]

    cfg.solver.ckpt_every = 1  # any nonzero enables stage-4 checkpointing
    orig = op.make_block_group_runner
    calls = {"n": 0}

    def wrapped_maker(*a, **k):
        runner = orig(*a, **k)

        def crashing(*ra, **rk):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("injected kill")
            return runner(*ra, **rk)

        return crashing

    monkeypatch.setattr(op, "make_block_group_runner", wrapped_maker)
    with pytest.raises(RuntimeError, match="injected kill"):
        op.run(cfg, ctx=build_context(cfg), verbose=False)
    assert (store.ckpt_dir("stage4") / "state.npz").exists()

    monkeypatch.setattr(op, "make_block_group_runner", orig)
    op.run(cfg, ctx=build_context(cfg), verbose=False)
    for r in range(2):
        out = load_displacement(store.modeled_h5(r))
        assert np.array_equal(np.array(out), ref[r]), r
    assert not (store.ckpt_dir("stage4") / "state.npz").exists()


def test_effective_filter_matches_full_resolution_windows():
    """Storing 1 row every save_every steps and striding the stored trace
    by filter_size // save_every must reproduce the exact training windows
    of a save_every=1 run (they both read steps at multiples of
    filter_size)."""
    from savtpu.models import strided_windows
    from savtpu.pipeline.model_training import effective_filter

    rng = np.random.default_rng(3)
    T, D, se, n_s = 1000, 6, 5, 20
    full = rng.normal(size=(T, D))
    stored = full[::se]

    cfg = Config()
    cfg.solver.save_every = se
    cfg.surrogate.filter_size = n_s
    eff = effective_filter(cfg)
    assert eff == n_s // se

    Xf, Yf = strided_windows(full, 4, 4, n_s, cut_off=0.5)
    Xs, Ys = strided_windows(stored, 4, 4, eff, cut_off=0.5)
    assert np.array_equal(Xf, Xs) and np.array_equal(Yf, Ys)

    cfg.surrogate.filter_size = 7  # not a multiple of save_every
    with pytest.raises(ValueError, match="multiple"):
        effective_filter(cfg)


def test_p2_steady_from_config(tmp_path):
    """cfg.solver.deg=2 drives the steady-only P2 path end-to-end
    (VERDICT item 7): stage 1 promotes the mesh, solves, writes the VTK;
    the dynamic/sharded layer refuses deg=2 with the reference's reason."""
    from savtpu.mesh import read_vtk
    from savtpu.pipeline import data_prepare
    from savtpu.pipeline.common import build_context

    cfg = Config()
    cfg.workdir = str(tmp_path / "Results")
    cfg.model_dir = str(tmp_path / "Distributed_save")
    cfg.beam_cells = (5, 1, 1)
    cfg.beam_extent = (5.0, 1.0, 1.0)
    cfg.solver.deg = 2
    prob = data_prepare.run(cfg, verbose=False)
    assert prob.deg == 2 and prob.edofs.shape[1] == 30

    out = read_vtk(tmp_path / "Results" / "Static" / "steady_distributed.vtk")
    assert out.num_points == prob.mesh.num_points

    # quadratic tip deflection ~ Euler-Bernoulli (P1 on this mesh locks)
    import json
    dy = np.asarray(
        __import__("savtpu.api", fromlist=["api"]).Simulation(cfg).steady()
    )
    tip = int(np.argmax(prob.mesh.points[:, 0]))
    eb = 0.5 * 5.0**4 / (8 * 1e6 / 12.0)
    assert abs(dy[3 * tip + 1] + eb) / eb < 0.3

    with pytest.raises(NotImplementedError, match="steady-only"):
        build_context(cfg)


def test_metrics_jsonl_written(tmp_path):
    """Every stage appends structured events to <workdir>/metrics.jsonl
    (SURVEY.md §5 observability, VERDICT item 10)."""
    import json as _json

    from savtpu.api import Simulation

    cfg = Config()
    cfg.workdir = str(tmp_path / "Results")
    cfg.model_dir = str(tmp_path / "Distributed_save")
    cfg.beam_cells = (6, 1, 1)
    cfg.beam_extent = (6.0, 1.0, 1.0)
    cfg.partition.n_parts = 2
    cfg.solver.num_steps = 100
    s = cfg.surrogate
    s.n_past = s.n_future = 4
    s.filter_size = 5
    s.batch_size = 2
    s.num_epochs = 5
    s.hidden_size = 8
    Simulation(cfg, verbose=False).run_all()

    lines = (tmp_path / "Results" / "metrics.jsonl").read_text().splitlines()
    events = [_json.loads(l)["event"] for l in lines]
    recs = {_json.loads(l)["event"]: _json.loads(l) for l in lines}
    for ev in ("stage1_solve", "stage2_extract", "stage3_train_stacked",
               "stage4_online", "stage5_metrics"):
        assert ev in events, events
    assert recs["stage1_solve"]["steps_per_sec"] > 0
    assert recs["stage4_online"]["comm_free_fraction"] > 0.5
    assert len(recs["stage3_train_stacked"]["final_val_r2"]) == 2


def test_prediction_consensus():
    """Duplicated shared DOFs get each owner's prediction averaged; exact
    (already-consistent) rows are a fixed point; pads untouched semantics
    (masked out of the average)."""
    from savtpu.pipeline.online_predictor import prediction_consensus

    # 3 parts, 2 shared slots each, SD = 4 global shared DOFs
    sgi = np.array([[0, 1], [1, 2], [2, 3]])
    smask = np.array([[1.0, 1.0], [1.0, 1.0], [1.0, 0.0]])
    preds = np.zeros((3, 2, 2))
    preds[0, :, :] = [[1.0, 2.0], [10.0, 20.0]]
    preds[1, :, :] = [[4.0, 6.0], [40.0, 60.0]]
    preds[2, :, :] = [[8.0, 99.0], [80.0, 99.0]]
    out = np.asarray(prediction_consensus(preds, sgi, smask, 4))
    # dof1 owned by parts 0 (slot 1) and 1 (slot 0): mean(2,4)=3
    assert out[0, 0, 1] == 3.0 and out[1, 0, 0] == 3.0
    assert out[1, 1, 0] == 30.0 and out[0, 1, 1] == 30.0
    # dof2 owned by parts 1 (slot 1) and 2 (slot 0): mean(6,8)=7
    assert out[1, 0, 1] == 7.0 and out[2, 0, 0] == 7.0
    # dof0 single-owner: unchanged
    assert out[0, 0, 0] == 1.0
    # consistent input is a fixed point
    again = np.asarray(prediction_consensus(out, sgi, smask, 4))
    real = smask[:, None, :] > 0
    assert np.allclose(again[np.broadcast_to(real, again.shape)],
                       out[np.broadcast_to(real, out.shape)])

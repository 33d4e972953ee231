"""Direct numerical parity against the reference's OWN source code.

Round-2 verdict #2: every parity claim previously rested on an
independently written NumPy oracle (tests/oracle.py). Here the original
implementation at /root/reference is imported directly (its only blockers
are import-time native deps — meshio/mpi4py — stubbed in sys.modules; the
math modules are pure NumPy/SciPy/torch) and compared number-for-number:

- element M/K/F on random tets vs Local_MKF (Tools/Mat_construction.py:23-76)
  and Local_K_coronary (:79-119),
- a full serial trajectory on the reference's 110-node beam vs
  parallel_explicit_solver_dis_pre at size=1 (Tools/Dynamic_solver.py:9-34;
  size=1 skips the communicator entirely, line 25) with the reference's own
  setup (Meshsize dt, Global_Assembly ghost step, Local_assembly_for_stiffness),
- feature scaling and window prep vs Scale_to_zero_one /
  Dis_data_filtered_subset_coronary (Tools/DNN_tools.py:259-313).

This closes BASELINE.md's <=1e-6 rel-L2 north star against the reference's
actual arithmetic, not a re-derivation of it.
"""

import pathlib
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_tools():
    if not pathlib.Path(REF, "Tools").exists():
        pytest.skip("reference source not available")
    # Stub the import-time native deps. The stubbed symbols are never
    # called by the code paths under test (meshio only reads files in the
    # drivers; MPI only matters at size>1, and Distributed_tools just
    # calls Get_rank at import).
    if "mpi4py" not in sys.modules:
        mpi4py = types.ModuleType("mpi4py")

        class _Comm:
            def Get_rank(self):
                return 0

            def Get_size(self):
                return 1

        mpi4py.MPI = types.SimpleNamespace(COMM_WORLD=_Comm())
        sys.modules["mpi4py"] = mpi4py
    sys.modules.setdefault("meshio", types.ModuleType("meshio"))
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import Tools.commons as commons
    import Tools.Dynamic_solver as DS
    import Tools.Mat_construction as MC

    return types.SimpleNamespace(MC=MC, DS=DS, commons=commons)


def _random_tets(n, rng):
    """Random well-shaped tets (positive Jacobian)."""
    tets = []
    while len(tets) < n:
        P = rng.normal(size=(4, 3))
        J = (P[1:] - P[0]).T
        if np.linalg.det(J) > 0.05:
            tets.append(P)
    return tets


def test_element_mkf_matches_reference_source(ref_tools):
    """savtpu's vmapped element kernel vs the reference's Local_MKF
    quadruple loop (Mat_construction.py:23-76), random tets, ramped load
    mid-ramp (t=0.37) and post-ramp (t=2.5)."""
    from savtpu.ops.element import element_mkf
    from savtpu.ops.material import LinearElastic

    E, nu, rho, fz = 1e6, 0.3, 1.0, 0.5
    mat = LinearElastic.from_engineering(E=E, nu=nu, rho=rho, fz=fz)
    elas = ref_tools.commons.elasticity(
        E * nu / ((1 + nu) * (1 - 2 * nu)), E / (2 * (1 + nu)), rho, fz,
        True,
    )
    rng = np.random.default_rng(42)
    for t in (0.37, 2.5):
        for P in _random_tets(8, rng):
            Mr, Kr, Fr = ref_tools.MC.Local_MKF(
                1, 4, P, elas, None, None, t
            )
            Ms, Ks, Fs = element_mkf(1, 2, mat, t, P)
            for a, b in ((Mr, Ms), (Kr, Ks), (Fr, Fs)):
                denom = max(np.abs(a).max(), 1e-30)
                assert np.abs(np.asarray(b) - a).max() / denom < 1e-12


def test_element_k_matches_reference_source(ref_tools):
    from savtpu.ops.element import element_k
    from savtpu.ops.material import LinearElastic

    E, nu = 1e6, 0.3
    mat = LinearElastic.from_engineering(E=E, nu=nu, rho=1.0, fz=0.5)
    elas = ref_tools.commons.elasticity(
        E * nu / ((1 + nu) * (1 - 2 * nu)), E / (2 * (1 + nu)), 1.0, 0.5,
        True,
    )
    rng = np.random.default_rng(7)
    for P in _random_tets(8, rng):
        Kr = ref_tools.MC.Local_K_coronary(1, 4, P, elas)
        Ks = element_k(1, 2, mat, P)
        assert (
            np.abs(np.asarray(Ks) - Kr).max() / np.abs(Kr).max() < 1e-12
        )


def test_serial_trajectory_matches_reference_source(ref_tools):
    """10k-step serial (size=1) trajectory on the reference's own
    beam_coarse.vtk, set up and stepped ENTIRELY by reference code
    (Data_prepare.py:127-240 at size=1), vs savtpu's jitted scan. The
    north-star criterion is rel-L2 <= 1e-6 (BASELINE.md); both sides run
    float64 so the agreement is limited only by summation order."""
    import jax.numpy as jnp

    from savtpu.config import Config
    from savtpu.mesh import read_vtk
    from savtpu.ops.assembly import FIntOperator
    from savtpu.solvers import make_step_fn, setup_problem
    from savtpu.solvers.explicit import run_explicit_jit

    MC, commons = ref_tools.MC, ref_tools.commons
    mesh = read_vtk(REF + "/Mesh_info/beam_coarse.vtk")
    Cells = np.asarray(mesh.tetra)
    Facets = np.asarray(mesh.triangles)
    Points = np.asarray(mesh.points)

    E, nu, rho, fz, Damp = 1e6, 0.3, 1.0, 0.5, 0.5
    elas = commons.elasticity(
        E * nu / ((1 + nu) * (1 - 2 * nu)), E / (2 * (1 + nu)), rho, fz,
        True,
    )
    elas_steady = commons.elasticity(elas.lmd, elas.mu, rho, fz, False)

    # Dirichlet scan (Data_prepare.py:127-136)
    Dirichlet_node = []
    for i in range(len(Facets)):
        if all(abs(Points[Facets[i][k]][0]) < 1e-9 for k in range(3)):
            for j in range(3):
                if Facets[i][j] not in Dirichlet_node:
                    Dirichlet_node.append(Facets[i][j])
    Dirichlet_global_dof = commons.node_to_dof(3, [0, 1, 2], Dirichlet_node)

    # dt (Data_prepare.py:147-154 at size=1)
    dt = 0.9 * commons.Meshsize(Cells, Points) / np.sqrt(
        E / rho / (1 - nu**2)
    )

    # lumped mass + pre-assembled force + ghost step (Data_prepare.py:158-189)
    npts = len(Points)
    d0 = np.zeros((3 * npts, 1))
    M_0, _, F_pre = MC.Global_Assembly_no_bc(1, Cells, Points, elas_steady, 0)
    lumped_M = commons.lumping_to_vec(M_0)
    M, K, F = MC.Global_Assembly(
        1, Cells, Points, Dirichlet_global_dof, elas, t=0
    )
    for i in range(3 * npts):
        for A in [0, 1, 2]:
            dirich = (commons.node_to_dof(3, [A], [i]))[0]
            if dirich in Dirichlet_global_dof:
                M[dirich, dirich] = 1
                F[dirich] = 0
    a0 = np.linalg.solve(M, F - K @ d0)
    dn = (d0 - dt * np.zeros_like(d0) + dt**2 / 2 * a0).reshape(-1, 1)

    # serial localization: every node is local, first-touch order = global
    all_nodes = list(range(npts))
    LocalK = MC.Local_assembly_for_stiffness(
        all_nodes, Cells, Points, 1, 4, elas, 1  # rank=1 silences prints
    )
    F_rankwise = F_pre.reshape(-1, 1)
    l_M = lumped_M.reshape(-1, 1)

    num_steps, save_stride = 10_000, 10
    d_0, d_n, tn = d0, dn, 0.0
    ref_traj = np.zeros((num_steps // save_stride, 3 * npts))
    for i in range(num_steps):
        Time = commons.Time_integration_displacement(tn, dt, d_0, d_n)
        d1 = ref_tools.DS.parallel_explicit_solver_dis_pre(
            LocalK, F_rankwise, Points, all_nodes, Dirichlet_global_dof,
            Time, elas, l_M, Damp, 1, 0, MODEL=False,
        )
        d_n, d_0, tn = d_0, d1, tn + dt
        if i % save_stride == 0:
            ref_traj[i // save_stride] = d1.reshape(-1)

    # savtpu side: same mesh, f64, dense serial scan
    cfg = Config()
    prob = setup_problem(cfg, mesh=mesh, dtype=jnp.float64)
    assert abs(prob.dt - dt) < 1e-12 * dt
    op = FIntOperator(prob.Ke, prob.edofs, prob.ndof, mode="dense")
    step = make_step_fn(
        op, prob.F_pre, prob.lumped_M, prob.mask, prob.alpha, prob.dt
    )
    traj, _ = run_explicit_jit(
        step, prob.d0, prob.dn, 0.0, prob.dt, num_steps, save_stride
    )
    traj = np.asarray(traj)

    rel = np.linalg.norm(traj - ref_traj) / np.linalg.norm(ref_traj)
    assert rel < 1e-6, rel
    # record how far under the north star we actually land
    print(f"serial parity vs reference source: rel-L2 = {rel:.3e}")


def test_scaling_matches_reference_source(ref_tools):
    import Tools.DNN_tools as DT

    from savtpu.models.data import scale_back, scale_forward, scale_to_zero_one

    rng = np.random.default_rng(3)
    X = rng.normal(size=(40, 20, 6)) * 0.01 - 0.004
    Y = rng.normal(size=(40, 20, 6)) * 0.01 - 0.004
    Xr, Yr, smax_r, smin_r = DT.Scale_to_zero_one(X.copy(), Y.copy())
    Xs, Ys, smax_s, smin_s = scale_to_zero_one(X, Y, mode="joint")
    assert np.allclose(Xs, Xr, atol=1e-15) and np.allclose(Ys, Yr, atol=1e-15)
    assert abs(smax_s - smax_r) < 1e-15 and abs(smin_s - smin_r) < 1e-15
    Z = rng.normal(size=(5, 6)) * 0.01
    assert np.allclose(
        scale_forward(Z, smax_s, smin_s),
        DT.scale_forward(Z, smax_r, smin_r),
        atol=1e-15,
    )
    assert np.allclose(
        scale_back(Z, smax_s, smin_s),
        DT.scale_it_back(Z, smax_r, smin_r),
        atol=1e-15,
    )


def test_window_prep_matches_reference_source(ref_tools, tmp_path):
    """Dis_data_filtered_subset_coronary (DNN_tools.py:284-313) vs
    strided_windows on the same HDF5 trace (f32 input so the torch .float()
    cast is a no-op and the comparison is exact)."""
    import h5py

    import Tools.DNN_tools as DT

    from savtpu.models.data import strided_windows

    rng = np.random.default_rng(11)
    D, T = 9, 700
    trace = rng.normal(size=(T, D)).astype(np.float32)
    path = tmp_path / "trace.hdf5"
    with h5py.File(path, "w") as f:
        f.create_dataset("Displacement", data=trace.T)  # (dofs, T) layout

    n_past, n_future, filt, cut = 5, 4, 7, 0.5
    Xr, Yr = DT.Dis_data_filtered_subset_coronary(
        "cpu", D, filt, n_past, n_future, str(path), cut
    )
    Xs, Ys = strided_windows(trace, n_past, n_future, filt, cut)
    assert Xr.shape == Xs.shape and Yr.shape == Ys.shape
    assert np.array_equal(Xr.numpy(), Xs.astype(np.float32))
    assert np.array_equal(Yr.numpy(), Ys.astype(np.float32))

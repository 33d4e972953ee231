"""One-shot problem assembly: everything the time loop needs, precomputed.

Mirrors the reference's setup phase (Data_prepare.py:147-208) — CFL dt,
lumped mass, pre-assembled external force, Dirichlet DOFs, ghost-step
initialization — but as a single vmapped-assembly pass producing static
arrays that get baked into the jitted stepper.
"""

from __future__ import annotations

from dataclasses import dataclass, replace as dc_replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config

# elements per device pass of the setup-time vmapped element kernel
# (see setup_problem's chunked accumulation)
ELEMENT_CHUNK = 262_144
from ..mesh import Mesh, beam_mesh, cfl_dt, dirichlet_nodes, read_mesh
from ..mesh.geometry import node_to_dof
from ..ops.assembly import (
    assemble_force,
    assemble_lumped_mass,
    dirichlet_mask,
    element_dofs,
)
from ..ops.element import batch_element_mkf, gather_coords
from ..ops.material import LinearElastic


@dataclass
class AssembledProblem:
    """Static data of one elastodynamics problem (serial numbering)."""

    mesh: Mesh
    material: LinearElastic
    deg: int
    n_quad: int
    dt: float
    alpha: float
    edofs: np.ndarray        # (E, 3nb) int32
    Ke: jnp.ndarray          # (E, 3nb, 3nb) element stiffness
    lumped_M: jnp.ndarray    # (ndof,) row-sum lumped mass
    F_pre: jnp.ndarray       # (ndof,) unramped external force (steady load)
    dirichlet_dofs: np.ndarray
    mask: jnp.ndarray        # (ndof,) 0 on Dirichlet DOFs
    d0: jnp.ndarray          # initial displacement
    dn: jnp.ndarray          # ghost step d_{-1}
    coords: jnp.ndarray      # (E, nb, 3) element coordinates

    @property
    def ndof(self) -> int:
        return self.mesh.num_dofs

    def with_dtype(self, dtype) -> "AssembledProblem":
        """Cast the runtime arrays (f32 benchmark path on TPU)."""
        cast = lambda a: jnp.asarray(a, dtype=dtype)
        return dc_replace(
            self,
            Ke=cast(self.Ke),
            lumped_M=cast(self.lumped_M),
            F_pre=cast(self.F_pre),
            mask=cast(self.mask),
            d0=cast(self.d0),
            dn=cast(self.dn),
            coords=cast(self.coords),
        )


def load_mesh(cfg: Config) -> Mesh:
    if cfg.mesh_path is not None:
        return read_mesh(cfg.mesh_path)
    nx, ny, nz = cfg.beam_cells
    return beam_mesh(nx, ny, nz, extent=cfg.beam_extent)


def setup_problem(
    cfg: Config,
    mesh: Optional[Mesh] = None,
    dtype=jnp.float64,
) -> AssembledProblem:
    """Assemble the problem — ALWAYS in float64 on the host CPU, then cast
    to ``dtype``. Assembling in the run dtype was measured to cost ~500x
    trajectory accuracy at f32 (element integrals, lumped mass and the
    ghost init all lose bits that the stepper then amplifies over 1e5
    steps); f64-assembled arrays cast to f32 track the f64 trajectory to
    ~4e-4 at 25k steps on TPU (with the HIGHEST-precision matvec)."""
    import contextlib

    import jax

    try:
        from jax._src.config import enable_x64 as _x64_ctx
    except ImportError:  # pragma: no cover - much older/newer jax
        _x64_ctx = lambda v: contextlib.nullcontext()
    try:
        cpu_ctx = jax.default_device(jax.devices("cpu")[0])
    except Exception:  # pragma: no cover - no cpu backend registered
        cpu_ctx = contextlib.nullcontext()
    with _x64_ctx(True), cpu_ctx:
        prob = _setup_problem_f64(cfg, mesh)
    if jnp.dtype(dtype) != jnp.float64:
        prob = prob.with_dtype(dtype)
    return prob


def _setup_problem_f64(
    cfg: Config,
    mesh: Optional[Mesh] = None,
    dtype=jnp.float64,
) -> AssembledProblem:
    mat_cfg = cfg.material
    sol = cfg.solver
    if mesh is None:
        mesh = load_mesh(cfg)

    material = LinearElastic(
        lmd=mat_cfg.lmd,
        mu=mat_cfg.mu,
        rho=mat_cfg.rho,
        fz=mat_cfg.fz,
        ramped=mat_cfg.ramped,
    )
    # steady/no-ramp variant: used for F_pre and lumped mass so that the
    # pre-assembled load is the full (unramped) body force, ramped per-step
    # (Data_prepare.py:160,175-176 use elas_steady here).
    material_steady = dc_replace(material, ramped=False)

    if sol.deg == 2:
        # steady-only P2 path (the reference's comment at
        # Data_prepare.py:42: 'p=2 only works for steady case'): promote a
        # P1 mesh to tetra10 on the fly; the dynamic/sharded layers guard
        # against deg != 1 themselves.
        if "tetra10" not in mesh.cells:
            from ..mesh.generator import to_p2

            mesh = to_p2(mesh)
        cells = mesh.cells["tetra10"]
        corner_tets = cells[:, :4]
    elif sol.deg == 1:
        cells = mesh.tetra
        corner_tets = cells
    else:
        raise ValueError(f"unsupported polynomial degree {sol.deg}")

    points = mesh.points
    ndof = mesh.num_dofs

    dt = cfl_dt(
        corner_tets, points, mat_cfg.E, mat_cfg.rho, mat_cfg.nu,
        gamma=sol.gamma,
    )

    coords = gather_coords(cells, points, dtype=dtype)
    edofs = element_dofs(cells)

    # The one-shot vmapped element pass materializes (E, 12, 12) M and K
    # tensors plus their fused B-matrix intermediates; past ~1M elements
    # that exceeds HBM (measured 18.75 GB at 512x20x20 = 1.23M tets on a
    # 16 GB chip). Chunk the pass and accumulate the assembled vectors;
    # Ke (needed downstream by ShardedProblem.build) is concatenated,
    # Me only kept when the ghost step will consume it (unramped load).
    E_tot = coords.shape[0]
    _CHUNK = ELEMENT_CHUNK
    if E_tot <= _CHUNK:
        Me, Ke, Fe = batch_element_mkf(
            sol.deg, sol.n_quad, material_steady, 0.0, coords
        )
        lumped_M = assemble_lumped_mass(Me, edofs, ndof)
        F_pre = assemble_force(Fe, edofs, ndof)
    else:
        mkf = jax.jit(
            lambda c: batch_element_mkf(
                sol.deg, sol.n_quad, material_steady, 0.0, c
            )
        )
        Kes, Fes, Mes = [], [], []
        lumped_M = jnp.zeros((ndof,), dtype=dtype)
        F_pre = jnp.zeros((ndof,), dtype=dtype)
        for s in range(0, E_tot, _CHUNK):
            Me_c, Ke_c, Fe_c = mkf(coords[s : s + _CHUNK])
            ed = edofs[s : s + _CHUNK]
            lumped_M = lumped_M + assemble_lumped_mass(Me_c, ed, ndof)
            F_pre = F_pre + assemble_force(Fe_c, ed, ndof)
            Kes.append(Ke_c)
            Fes.append(Fe_c)
            if not mat_cfg.ramped:
                Mes.append(Me_c)
        Ke = jnp.concatenate(Kes, axis=0)
        Fe = jnp.concatenate(Fes, axis=0)
        Me = jnp.concatenate(Mes, axis=0) if Mes else None

    if sol.deg == 2:
        # the boundary triangles are corner facets; edge-midpoint nodes on
        # the clamped coordinate plane must be clamped too, so detect by
        # coordinate over all nodes (the plane IS the face on this family
        # of geometries)
        dnodes = np.flatnonzero(
            np.abs(
                points[:, cfg.partition.dirichlet_axis]
                - cfg.partition.dirichlet_value
            )
            < max(cfg.partition.dirichlet_tol, 1e-9)
        )
    else:
        dnodes = dirichlet_nodes(
            mesh.triangles,
            points,
            axis=cfg.partition.dirichlet_axis,
            value=cfg.partition.dirichlet_value,
            tol=cfg.partition.dirichlet_tol,
        )
    ddofs = node_to_dof(dnodes)
    mask = dirichlet_mask(ndof, ddofs, dtype=dtype)

    d0 = jnp.zeros((ndof,), dtype=dtype)
    v0 = jnp.zeros((ndof,), dtype=dtype)

    # ghost step d_{-1}: with a ramped load F(0)=0 and zero initial data,
    # a0 = M^{-1}(F - K d0) = 0 so d_{-1} = 0 analytically (the reference
    # notes this at Data_prepare.py:182 but still assembles the dense
    # system). Skip the O(ndof^2) solve in that case; otherwise use the
    # dense path (small meshes) or matrix-free CG (large).
    if mat_cfg.ramped:
        dn = jnp.zeros((ndof,), dtype=dtype)
    else:
        from .steady import ghost_step_init, ghost_step_init_cg

        Fe_t0 = Fe
        if ndof <= 6144:
            dn = ghost_step_init(
                Me, Ke, Fe_t0, edofs, ndof, ddofs, d0, v0, float(dt)
            )
        else:
            dn = ghost_step_init_cg(
                Me, Ke, Fe_t0, edofs, ndof, ddofs, d0, v0, float(dt)
            )

    return AssembledProblem(
        mesh=mesh,
        material=material,
        deg=sol.deg,
        n_quad=sol.n_quad,
        dt=float(dt),
        alpha=sol.alpha,
        edofs=edofs,
        Ke=Ke,
        lumped_M=lumped_M,
        F_pre=F_pre,
        dirichlet_dofs=np.asarray(ddofs),
        mask=mask,
        d0=d0,
        dn=dn,
        coords=coords,
    )

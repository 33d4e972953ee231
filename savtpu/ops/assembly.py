"""Assembly: element arrays -> global operators, the TPU way.

The reference assembles dense global matrices with nested Python loops
(Tools/Mat_construction.py:122-231) and does F_int as a SciPy CSR matvec
(Tools/Dynamic_solver.py:12). Here assembly is data movement:

- ``element_dofs``: (E, 3nb) interleaved DOF index tensor (dof = 3*node + c,
  Tools/commons.py:66-71) — precomputed once, baked into the jitted stepper.
- ``assemble_dense``: scatter-add of element blocks (verification / steady /
  modal path, equivalent to Global_Assembly_no_bc).
- ``assemble_lumped_mass``: row-sum lumping straight to a DOF vector
  (lumping_to_vec, Tools/commons.py:103-107) via one segment_sum.
- ``FIntOperator``: the hot operator F_int(d) = K_nobc @ d with three
  interchangeable execution strategies (dense MXU matmul / element-by-element
  gather->batched matmul->segment_sum / BCOO sparse). The fused Pallas
  step kernel lives in savtpu.ops.pallas_step; the scalable sharded
  strategies (dense local-K / node-block ELL) in savtpu.parallel.sharded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .precision import HIGHEST


def element_dofs(cells: np.ndarray) -> np.ndarray:
    """(E, 3*nb) int32 interleaved DOF indices per element."""
    cells = np.asarray(cells, dtype=np.int64)
    E, nb = cells.shape
    dofs = 3 * cells[:, :, None] + np.arange(3)[None, None, :]
    return dofs.reshape(E, 3 * nb).astype(np.int32)


def assemble_dense(Ke, edofs, ndof: int):
    """Dense global matrix by scatter-add of (E, 3nb, 3nb) element blocks."""
    Ke = jnp.asarray(Ke)
    edofs = jnp.asarray(edofs)
    K = jnp.zeros((ndof, ndof), dtype=Ke.dtype)
    return K.at[edofs[:, :, None], edofs[:, None, :]].add(Ke)


def assemble_vector(Fe, edofs, ndof: int):
    """Global vector by segment_sum of (E, 3nb) element vectors."""
    Fe = jnp.asarray(Fe)
    edofs = jnp.asarray(edofs)
    return jax.ops.segment_sum(
        Fe.reshape(-1), edofs.reshape(-1), num_segments=ndof
    )


def assemble_force(Fe, edofs, ndof: int):
    return assemble_vector(Fe, edofs, ndof)


def assemble_lumped_mass(Me, edofs, ndof: int):
    """Row-sum lumped mass vector: lumped[p] = sum_q M[p, q], assembled as a
    single segment_sum of per-element row sums."""
    rows = jnp.asarray(Me).sum(axis=2)  # (E, 3nb)
    return assemble_vector(rows, edofs, ndof)


def lumping(M):
    """Row-sum lumping to a DIAGONAL MATRIX (reference
    Tools/commons.py:95-100). The reference's own drivers never call
    this form (they use the vector form below, as does the whole
    pipeline here) — provided for API completeness."""
    return jnp.diag(jnp.asarray(M).sum(axis=1))


def lumping_to_vec(M):
    """Row-sum lumping to a vector (Tools/commons.py:102-106)."""
    return jnp.asarray(M).sum(axis=1)


def apply_dirichlet_dense(K, F, dirichlet_dofs):
    """Strong Dirichlet on a dense system: zero rows/cols, unit diagonal,
    zero rhs — equivalent to the reference's assembly-time row/col skip
    (Mat_construction.py:178-195) followed by the unit-diagonal fix-up
    (Steady_solvers.py:16-21). Homogeneous BCs only (lift terms are *0
    no-ops in the reference too)."""
    d = jnp.asarray(dirichlet_dofs)
    ndof = K.shape[0]
    keep = jnp.ones((ndof,), dtype=K.dtype).at[d].set(0.0)
    K = K * keep[:, None] * keep[None, :]
    K = K.at[d, d].set(1.0)
    F = F * keep
    return K, F


def dirichlet_mask(ndof: int, dirichlet_dofs, dtype=jnp.float64):
    """0/1 mask, 0 on constrained DOFs — multiplying d1 by it is the
    strong enforcement d1[Dirichlet] = 0 (Dynamic_solver.py:20)."""
    return (
        jnp.ones((ndof,), dtype=dtype)
        .at[jnp.asarray(dirichlet_dofs)]
        .set(0.0)
    )


class FIntOperator:
    """F_int(d) = K_nobc @ d with selectable execution strategy.

    mode='dense'  — one (ndof, ndof) matmul; best when the (padded) system
                    fits VMEM-friendly tiles (small/medium shards, MXU).
    mode='ebe'    — matrix-free: gather d per element, batched (E,3nb,3nb)
                    matvec, segment_sum scatter-add; scales to big meshes.
    mode='bcoo'   — BCOO sparse matvec.
    mode='auto'   — dense below ``dense_cutoff`` DOFs, else ebe.
    """

    def __init__(
        self,
        Ke,
        edofs,
        ndof: int,
        mode: str = "auto",
        dense_cutoff: int = 6144,
    ):
        self.ndof = int(ndof)
        self.edofs = jnp.asarray(edofs, dtype=jnp.int32)
        self.Ke = jnp.asarray(Ke)
        if mode == "auto":
            mode = "dense" if ndof <= dense_cutoff else "ebe"
        self.mode = mode
        self._dense = None
        self._bcoo = None
        if mode == "dense":
            self._dense = assemble_dense(self.Ke, self.edofs, ndof)
        elif mode == "bcoo":
            from jax.experimental import sparse as jsparse

            E, nb3, _ = self.Ke.shape
            rows = jnp.repeat(self.edofs[:, :, None], nb3, axis=2)
            cols = jnp.repeat(self.edofs[:, None, :], nb3, axis=1)
            idx = jnp.stack(
                [rows.reshape(-1), cols.reshape(-1)], axis=1
            )
            self._bcoo = jsparse.BCOO(
                (self.Ke.reshape(-1), idx), shape=(ndof, ndof)
            ).sum_duplicates(nse=E * nb3 * nb3)
        elif mode not in ("ebe", "dense"):
            raise ValueError(f"unknown FIntOperator mode {mode!r}")

    @property
    def dense_matrix(self):
        if self._dense is None:
            self._dense = assemble_dense(self.Ke, self.edofs, self.ndof)
        return self._dense

    def __call__(self, d):
        d = d.reshape(-1)
        if self.mode == "dense":
            return jnp.dot(self._dense, d, precision=HIGHEST)
        if self.mode == "bcoo":
            return self._bcoo @ d
        # element-by-element (multiply+reduce: einsum('eij,ej->ei') lowers
        # poorly on TPU for small inner dims)
        d_e = d[self.edofs]  # (E, 3nb)
        f_e = jnp.sum(self.Ke * d_e[:, None, :], axis=-1)
        return jax.ops.segment_sum(
            f_e.reshape(-1), self.edofs.reshape(-1), num_segments=self.ndof
        )

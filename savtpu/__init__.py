"""savtpu — a TPU-native synchronization-avoiding distributed FEM framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
desResLab/Synchronization-avoiding-algorithms (the reference): distributed
explicit FEM structural elastodynamics where, after a warm-up of synchronized
steps, the cross-shard halo exchange is replaced by per-shard LSTM
encoder-decoder prediction of the shared (interface) DOFs — removing
communication from 97% of the time steps.

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):

- ``savtpu.mesh``      — mesh IO (legacy VTK), structured beam generator, CFL.
- ``savtpu.ops``       — element core: quadrature, shape functions, vmapped
                         element (M, K, F) kernels, segment-sum assembly,
                         Pallas element-force kernel.
- ``savtpu.parallel``  — partitioning (native C++ / Python), halo index maps,
                         ``shard_map`` solver over a ``jax.sharding.Mesh``.
- ``savtpu.solvers``   — steady solve, modal analysis, explicit central
                         difference ``lax.scan`` stepper, hybrid (NN) driver.
- ``savtpu.models``    — JAX LSTM encoder-decoder surrogate, optax training,
                         phase-interleaved batched online predictor.
- ``savtpu.io``        — artifact contract (HDF5/CSV/curves) + checkpoints.
- ``savtpu.pipeline``  — stage drivers (data_prepare, shared_extraction,
                         model_training, online_predictor, plotter).

The reference's math contract is preserved exactly (element integrals,
central-difference update, LSTM architecture, sync-avoiding schedule); its
mechanics (Python loops, root-centralized MPI gather/bcast) are replaced with
vmapped kernels, ``lax.scan``, and XLA collectives over ICI.
"""

__version__ = "0.1.0"


def enable_x64() -> None:
    """Enable float64 in JAX (needed for ≤1e-6 parity with the reference's
    float64 NumPy pipeline). Call before creating arrays; drivers and tests
    call this, the TPU benchmark path keeps float32."""
    import jax

    jax.config.update("jax_enable_x64", True)

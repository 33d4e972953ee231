"""FEM matmul precision control.

On TPU, float32 matmuls default to ONE bf16 MXU pass (~8-bit mantissa per
product term). FEM internal-force matvecs have huge internal cancellation
(row terms ~ E*h*|d| summing down to ~M*a, 3-4 orders smaller), so the
default loses everything: measured 2.2 RELATIVE error on F_int = K @ d on
the 48x4x4 beam, which random-walks the explicit trajectory ~8-20% off the
f64 truth over 1e5 steps. ``Precision.HIGHEST`` (multi-pass f32 emulation)
brings the same matvec to 7e-5 relative — the solver compute path must
always use it. The NN/surrogate path keeps the fast default (bf16 noise is
immaterial to LSTM training).
"""

from __future__ import annotations

import functools

import jax

HIGHEST = jax.lax.Precision.HIGHEST


def with_fem_precision(fn):
    """Trace ``fn`` under highest matmul precision (applies to @ / einsum
    / jnp.dot without a precision= argument)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped

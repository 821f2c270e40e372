"""Estimation-path matmul precision control.

TPU matmuls default to bf16 operand rounding (8-bit mantissa).  For the
FRONT-END's big contractions that is either exact by construction (the
Hamming matcher's +-1 operands) or handled per-op (BRIEF/patch selection at
Precision.HIGHEST — ops/orb.py, ops/patches.py).  The ESTIMATION path is
different: pose composition chains (4x4), Kabsch covariances, RANSAC
residual scoring, and BA Jacobian products are tiny matmuls whose bf16
rounding is ~0.4% relative — centimeters at scene scale, the same order as
the RANSAC inlier gate (0.05 m), and it compounds over hundreds of chained
frames.  These matmuls are microscopic (3x3/4x4/Kx3), so full f32 costs
nothing, and it keeps production TPU behavior aligned with the CPU test
suite (tests/conftest.py forces highest precision).

`f32_estimation` wraps a function body in jax.default_matmul_precision
("float32") AT TRACE TIME: apply it under `jax.jit` so every matmul/einsum
traced inside the estimation graph gets f32 precision, while the fused
front-end graphs keep their explicit per-op choices.
"""

from __future__ import annotations

import functools

import jax


def f32_estimation(fn):
    """Decorator: trace `fn` with float32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped

"""Pointwise streaming ops: mixer, stereo matrix, delay line.

Reference: src/filter.cpp:176-199 (`mixer`, `LRExtraction`) and the inline
delay-line logic of src/project.cpp:152-159.  These are pure VPU elementwise
ops; XLA fuses them into neighbours.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def mixer(a: jax.Array, b: jax.Array) -> jax.Array:
    """DSB-SC downconversion product with x2 gain (reference src/filter.cpp:176-184).

    The x2 recovers the carrier-product amplitude loss:
    cos(wc t)*m(t)*cos(wc t)*2 = m(t)*(1 + cos(2 wc t))."""
    return 2.0 * a * b


@jax.jit
def lr_matrix(mono: jax.Array, stereo: jax.Array):
    """L/R de-matrixing (reference src/filter.cpp:186-199):
    L = (mono + stereo)/2, R = (mono - stereo)/2."""
    left = (mono + stereo) * 0.5
    right = (mono - stereo) * 0.5
    return left, right


@jax.jit
def delay_line(x: jax.Array, state: jax.Array):
    """Fixed integer delay with carried tail (reference src/project.cpp:152-159).

    out = state ++ x[:-d];  new_state = x[-d:]  (d = state length).
    Used to align the mono path against the stereo band-pass group delay
    (mono_delay=5, reference src/project.cpp:308) and the RDS channel path
    against its carrier-recovery chain.
    """
    d = state.shape[-1]
    out = jnp.concatenate([state, x[..., : x.shape[-1] - d]], axis=-1)
    return out, x[..., x.shape[-1] - d:]

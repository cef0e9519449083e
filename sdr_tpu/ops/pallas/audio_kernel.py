"""Pallas decimating-FIR kernel for the audio resample pair.

The XLA tiled banded-GEMM engine (ops/banded.py) must CONCATENATE the
carried tail onto the stream and materialize the shifted window stack —
at the production stereo shape the (2, C, n) stack's tail-concat
(dynamic-update-slice) plus its layout copies cost ~1.2 ms/step, more
than the conv math itself (round-5 profile).  This kernel runs the same
banded matmul per (C, tile) block with the carried context expressed the
way the channelizer kernel does it: a second clamped BlockSpec over the
same operand supplies columns [t*tile-CTX, t*tile) and tile 0 swaps in
the carried-tail operand — nothing is concatenated or copied in HBM, and
both streams of the audio pair (fm -> mono, mixed -> stereo) share the
band matrix inside one launch.

Semantics: y[u] = sum_l h_rev[l] * xp[D*u + l] with xp = tail(taps-1) ++ x
— identical terms to ops/resample.PolyphaseResampler at up=1 (reference
src/filter.cpp:67-103), reduction order differing only by the dense band's
zero rows (gated to float tolerance in tests/test_pallas.py).  The carried
state here is the last CTX RAW input samples per stream (vs the
resampler's taps-1), so this engine has its own state layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CTX = 128  # carried input context columns (covers taps-1 <= 128)


def _audio_band(coeff: np.ndarray, down: int, ot: int) -> np.ndarray:
    """(CTX + D*ot, ot) band: A[m, u] = h_rev[l] at m = D*u + l + CTX-(T-1),
    so window col m holds input sample (tile_start + m - CTX) and output u
    is the decimated FIR at tile position u."""
    taps = len(coeff)
    h_rev = np.asarray(coeff, np.float64)[::-1]
    in_rows = CTX + down * ot
    a = np.zeros((in_rows, ot), np.float32)
    for u in range(ot):
        base = down * u + CTX - (taps - 1)
        for l in range(taps):
            m = base + l
            if 0 <= m < in_rows:
                a[m, u] = h_rev[l]
    return a


def _pair_kernel(ta_ref, tb_ref, la_ref, lb_ref, xa_ref, xb_ref, a_ref,
                 ya_ref, yb_ref, *, compute_dtype):
    t = pl.program_id(0)
    for left_ref, tail_ref, x_ref, y_ref in (
            (la_ref, ta_ref, xa_ref, ya_ref),
            (lb_ref, tb_ref, xb_ref, yb_ref)):
        left = jnp.where(t == 0, tail_ref[:, :], left_ref[:, :])
        w = jnp.concatenate([left, x_ref[:, :]], axis=1).astype(compute_dtype)
        y_ref[:, :] = jnp.dot(w, a_ref[:, :],
                              preferred_element_type=jnp.float32
                              ).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("down", "tile", "interpret",
                                             "compute_dtype", "out_dtype"))
def _pair_call(tail_a, tail_b, xa, xb, a, *, down, tile, interpret,
               compute_dtype, out_dtype):
    c, n = xa.shape
    assert n % tile == 0 and tile % (down * 128) == 0, (n, tile, down)
    ot = tile // down
    grid = n // tile
    kernel = functools.partial(_pair_kernel, compute_dtype=compute_dtype)
    a = a.astype(compute_dtype)
    if compute_dtype == jnp.bfloat16 and interpret:
        a = a.astype(jnp.float32)
    left_spec = pl.BlockSpec(
        (c, CTX), lambda t: (0, jnp.maximum(t * (tile // CTX) - 1, 0)),
        memory_space=pltpu.VMEM)
    tail_spec = pl.BlockSpec((c, CTX), lambda t: (0, 0),
                             memory_space=pltpu.VMEM)
    main_spec = pl.BlockSpec((c, tile), lambda t: (0, t),
                             memory_space=pltpu.VMEM)
    ya, yb = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(jax.ShapeDtypeStruct((c, n // down), out_dtype),) * 2,
        in_specs=[tail_spec, tail_spec, left_spec, left_spec,
                  main_spec, main_spec,
                  pl.BlockSpec(a.shape, lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((c, ot), lambda t: (0, t),
                                memory_space=pltpu.VMEM),) * 2,
        interpret=interpret,
    )(tail_a, tail_b, xa, xb, xa, xb, a)
    return ya, yb


class PairDecimFIR:
    """Two same-filter decimating FIRs (U=1) in one Pallas launch.

    __call__(xa, xb, tail_a, tail_b) -> (ya, yb, new_tail_a, new_tail_b);
    tails are the last CTX raw input samples per stream (init zeros)."""

    def __init__(self, coeff: np.ndarray, down: int, *, tile: int = 3840,
                 compute_dtype=jnp.float32, out_dtype=jnp.float32):
        assert len(coeff) - 1 <= CTX, (len(coeff), CTX)
        self.down = int(down)
        self.taps = len(coeff)
        self.tile = int(tile)
        self.compute_dtype = compute_dtype
        self.out_dtype = out_dtype
        self._bands: dict[int, jax.Array] = {}
        self._coeff = np.asarray(coeff, np.float64)

    def _band(self, ot: int) -> np.ndarray:
        # cache HOST arrays: a jnp.asarray here would leak tracers when
        # the first call happens inside an enclosing jit trace
        if ot not in self._bands:
            self._bands[ot] = _audio_band(self._coeff, self.down, ot)
        return self._bands[ot]

    def init_state(self, batch_shape: tuple[int, ...] = (),
                   dtype=jnp.float32) -> jax.Array:
        return jnp.zeros(batch_shape + (CTX,), dtype)

    def __call__(self, xa, xb, tail_a, tail_b,
                 interpret: bool | None = None):
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        *lead, n = xa.shape
        flat = lambda v: v.reshape(-1, v.shape[-1])
        xa2, xb2 = flat(xa), flat(xb)
        ta2, tb2 = flat(tail_a), flat(tail_b)
        tile = _largest_multiple_divisor(n, self.down * 128, self.tile)
        ya, yb = _pair_call(ta2, tb2, xa2, xb2,
                            jnp.asarray(self._band(tile // self.down)),
                            down=self.down, tile=tile, interpret=interpret,
                            compute_dtype=self.compute_dtype,
                            out_dtype=self.out_dtype)
        m = n // self.down
        return (ya.reshape(*lead, m), yb.reshape(*lead, m),
                xa[..., n - CTX:], xb[..., n - CTX:])


def _largest_multiple_divisor(n: int, unit: int, cap: int) -> int:
    for k in range(min(cap // unit, n // unit), 0, -1):
        if n % (k * unit) == 0:
            return k * unit
    raise ValueError(f"{n} not divisible by any multiple of {unit}")

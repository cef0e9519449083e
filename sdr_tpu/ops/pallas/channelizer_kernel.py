"""Pallas wideband-channelizer kernel: pipelined im2col GEMM + rotation.

The XLA mfb engine (ops/channelizer.py) computes each time tile as a
station-major GEMM inside a `lax.map` — a sequential TPU while-loop with no
DMA/compute overlap between tiles, which bounded the engine two rounds
running (BASELINE.md round-4 channelizer notes; VERDICT r4 next-round item
1).  This kernel replaces the loop with a `pallas_call` grid whose input
windows are fetched by the automatic pipeliner: tile t+1's HBM->VMEM copy
runs while tile t computes.  The overlapping left context is expressed as
a SECOND block spec over the same operand — main (2D, tile) block at t
plus a (2D, EXT) window at t*tile-EXT (index clamped at 0; tile 0 swaps in
the carried-tail operand instead) — so no manual DMA bookkeeping is
needed, no caller-side concat/pad of the raw block exists, and the carried
state is simply the previous block's last EXT columns.

Math is identical to the XLA engine (ops/channelizer.py docstring): with
B2[c, j] the modulated-bank im2col matrix (station-major: K real rows then
K imag rows) and xr the (rows, 2D)-phased interleaved stream,

    out[c, u] = sum_j B2[c, j] * xr[u - T + j//2D, j%2D]      (T history cols)
    (i, q)[k, u] = rotate(out[k, u], out[K+k, u]) by e^{j theta_k(u)}

The in-kernel im2col is n_shift sublane-concatenated lane-rolled slices of
the (2D, EXT+tile) window — pure VPU shifts feeding ONE (2K, 2D*n_shift) x
(2D*n_shift, tile) MXU matmul per tile whose contraction (~2*taps+2D) has
essentially no banded-zero waste, unlike the front-end's band matrix.  The
residual oscillator rotation uses the same factored host-f64 phasor tables
as the XLA engine: a per-tile (K, 1) start phasor (carried phase composed
with the row table in XLA — K-element work per block) times the (K, tile)
base table, fused into the output write.

u8 ingest decodes in-kernel ((x-128)/128 exactly, reference
src/iofunc.cpp:62-69 semantics) — the 8x f32 wideband stream never exists
in HBM.  Ingest layouts:

  * flat (2N,) interleaved — pays ONE u8 relayout pass on device (the
    (rows, 2D) -> (2D, rows) transpose; measured ~200 us per 2 MB block,
    u8 retiling is byte-granular and slow on TPU).
  * pre-phased (2D, N/D) via `call_cols` — ZERO device-side prep; the host
    deinterleaves while copying (a trivial strided memcpy the native
    C++ reader can do for free during ingest framing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EXT = 128  # columns of carried/overlap context (must cover n_shift - 1)


def _mfb_kernel(tail_ref, xl_ref, xm_ref, bm_ref, rc_ref, rs_ref, br_ref,
                bi_ref, i_ref, q_ref, *, kp, n_shift, t_cols, tile,
                compute_dtype):
    t = pl.program_id(0)
    # left context: previous EXT columns of the stream — the clamped left
    # block for t >= 1, the carried tail operand for t == 0
    left = jnp.where(t == 0, tail_ref[:, :], xl_ref[:, :])
    xt = jnp.concatenate([left, xm_ref[:, :]], axis=1)  # (2D, EXT+tile)
    if xt.dtype == jnp.uint8:
        # Mosaic has no u8->float cast; XOR the sign bit to reinterpret the
        # excess-128 byte as int8 (exactly x-128), then widen.  Decode to
        # f32 regardless of compute dtype: the im2col rolls below only
        # lower for 32-bit lanes; the matmul operand is cast after.
        xt = (pltpu.bitcast(xt ^ jnp.uint8(0x80), jnp.int8)
              .astype(jnp.float32) * jnp.float32(1.0 / 128.0))
    else:
        xt = xt.astype(jnp.float32)
    # im2col: n_shift lane-rolled copies stacked on sublanes.  Plain
    # slices xt[:, off+s : off+s+tile] carry mismatched lane offsets that
    # Mosaic cannot concat ("offset mismatch on non-concat dimension");
    # roll normalizes each piece to offset 0 (the wrapped head lands
    # beyond column `tile` and is sliced away: off+s <= EXT by the
    # n_shift <= t_cols+1 invariant).
    width = tile + EXT
    off = EXT - t_cols
    xim = jnp.concatenate(
        [pltpu.roll(xt, shift=width - (off + s), axis=1)[:, :tile]
         for s in range(n_shift)], axis=0)              # (2D*n_shift, tile)
    # the decode is exact in bf16 ((x-128) and /128 both representable),
    # so casting after the f32 rolls equals decoding at bf16 directly
    xim = xim.astype(compute_dtype)
    out = jnp.dot(bm_ref[:, :], xim, preferred_element_type=jnp.float32)
    c_r, c_i = out[:kp, :], out[kp:, :]                 # (Kp, tile)
    # per-tile start phasor: column t of the (Kp, A_pad) rot tables.  A
    # (Kp, 1) BlockSpec is not a legal lane tile and Mosaic only allows
    # dynamic lane offsets it can prove are 128-multiples, so load the
    # aligned 128-wide chunk containing t ((t//128)*128 is provably
    # aligned) and select lane t%128 with an iota mask + lane reduce.
    cc = rc_ref[:, pl.ds((t // 128) * 128, 128)]        # (Kp, 128)
    cs = rs_ref[:, pl.ds((t // 128) * 128, 128)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    m = (lane == t % 128).astype(jnp.float32)
    sr = jnp.sum(cc * m, axis=1, keepdims=True)         # (Kp, 1)
    si = jnp.sum(cs * m, axis=1, keepdims=True)
    br, bi = br_ref[:, :], bi_ref[:, :]                 # (Kp, tile)
    cos_t = sr * br - si * bi
    sin_t = sr * bi + si * br
    odt = i_ref.dtype
    i_ref[:, :] = (c_r * cos_t - c_i * sin_t).astype(odt)
    q_ref[:, :] = (c_r * sin_t + c_i * cos_t).astype(odt)


@functools.partial(jax.jit, static_argnames=("kp", "n_shift", "t_cols",
                                             "tile", "compute_dtype",
                                             "interpret", "out_dtype"))
def _mfb_pallas_call(tail, xbt, bm, rotc, rots, baser, basei, *, kp, n_shift,
                     t_cols, tile, compute_dtype, interpret,
                     out_dtype=jnp.float32):
    two_d, n_out = xbt.shape
    assert tile % 128 == 0 and n_out % tile == 0, (tile, n_out)
    assert n_shift <= t_cols + 1 <= EXT + 1, (n_shift, t_cols, EXT)
    grid = n_out // tile
    kernel = functools.partial(_mfb_kernel, kp=kp, n_shift=n_shift,
                               t_cols=t_cols, tile=tile,
                               compute_dtype=compute_dtype)
    bm = bm if compute_dtype == jnp.float32 else bm.astype(compute_dtype)
    if compute_dtype == jnp.bfloat16 and interpret:
        # CPU interpret: keep bf16 rounding, dot in f32 (same fallback as
        # the XLA engine's CPU path)
        bm = bm.astype(jnp.float32)
    i_out, q_out = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(jax.ShapeDtypeStruct((kp, n_out), out_dtype),) * 2,
        in_specs=[
            pl.BlockSpec((two_d, EXT), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            # left-context columns [t*tile-EXT, t*tile): a second view of
            # the main operand, auto-pipelined; clamped at 0 for tile 0
            # (whose left context is the tail operand above)
            pl.BlockSpec((two_d, EXT),
                         lambda t: (0, jnp.maximum(t * (tile // EXT) - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((two_d, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bm.shape, lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(rotc.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(rots.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, tile), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, tile), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((kp, tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM),) * 2,
        interpret=interpret,
    )(tail, xbt, xbt, bm, rotc, rots, baser, basei)
    return i_out, q_out


class PallasMFB:
    """Stateful Pallas modulated-filter-bank channelizer engine.

    Drop-in for the XLA mfb engine's interleaved path: __call__(body, state)
    with body the raw interleaved block (2N,) in the constructed ingest
    dtype (u8 or f32), or `call_cols(xbt, state)` with the pre-phased
    (2D, N/D) layout (zero device-side prep).  state = {"phase": (K,),
    "tail": (2D, EXT) raw trailing columns}.  Constructed by
    WidebandChannelizer(engine="pallas").
    """

    def __init__(self, coeff: np.ndarray, dphi: np.ndarray, decim: int, *,
                 tile: int = 4096, compute_dtype=jnp.float32,
                 ingest: str = "f32", out_dtype=jnp.float32):
        from sdr_tpu.ops.channelizer import _modulated_bank

        self.decim = int(decim)
        self.k = len(dphi)
        self.kp = -(-self.k // 8) * 8          # station rows padded for VMEM
        self.taps = len(coeff)
        self.state_len = self.taps - 1
        self.tile = int(tile)
        self.compute_dtype = compute_dtype
        assert ingest in ("f32", "u8"), ingest
        self.ingest = ingest
        # bf16 output materialization: the per-station I/Q writes are the
        # kernel's HBM bound (K x N/D x 2 rails x 4 B vs N bytes read);
        # storing bf16 halves them.  Rotation stays f32 in-register.
        self.out_dtype = out_dtype
        self._dphi = np.asarray(dphi, np.float64)
        dphi_pad = np.concatenate([self._dphi,
                                   np.zeros(self.kp - self.k)])
        two_d = 2 * self.decim
        # column-aligned history: T_cols whole (2D)-columns cover the
        # 2*(taps-1) carried samples; delta pads the filter placement so
        # the extra-old samples multiply zero rows
        delta = (-2 * self.state_len) % two_d
        self.t_cols = (2 * self.state_len + delta) // two_d
        rhs = _modulated_bank(np.asarray(coeff, np.float64), dphi_pad)
        self._n_shift = -(-(2 * self.taps + delta) // two_d)
        rows = two_d * self._n_shift
        b = np.zeros((rows, 2 * self.kp), np.float32)
        for l in range(self.taps):
            b[2 * l + delta, :] = rhs[:, 0, l]
            b[2 * l + 1 + delta, :] = rhs[:, 1, l]
        # station-major, real block over imag block (so the kernel's
        # sublane split out[:Kp] / out[Kp:] is contiguous, no stride-2)
        bt = b.T                                   # (2Kp, rows)
        self._bm = jnp.asarray(np.concatenate([bt[0::2], bt[1::2]], axis=0))
        self._ramp_cache: dict = {}

    def init_state(self):
        two_d = 2 * self.decim
        tail = (jnp.full((two_d, EXT), 128, jnp.uint8)
                if self.ingest == "u8"
                else jnp.zeros((two_d, EXT), jnp.float32))
        return {"phase": jnp.zeros((self.k,), jnp.float32), "tail": tail}

    def _tables(self, n_out: int, tile: int):
        """Factored host-f64 phasor tables (padded station axis):
        row (Kp, A) at tile starts, base (Kp, tile) within a tile, and the
        per-block (K,) phase advance — same factoring as
        WidebandChannelizer._phase_tables (theta = dphi*(i*D + 1))."""
        key = (n_out, tile)
        if key not in self._ramp_cache:
            a = n_out // tile
            d = self.decim
            row = (self._dphi[:, None]
                   * (np.arange(a, dtype=np.float64) * (tile * d))[None, :]
                   ) % (2.0 * np.pi)
            base = (self._dphi[:, None]
                    * (np.arange(tile, dtype=np.float64) * d + 1.0)[None, :]
                    ) % (2.0 * np.pi)
            adv = (self._dphi * (n_out * d)) % (2.0 * np.pi)
            pad = ((0, self.kp - self.k), (0, 0))
            j = lambda x: np.asarray(np.pad(x, pad), np.float32)
            # host arrays (a jnp.asarray here would leak tracers when the
            # first call happens inside an enclosing jit trace)
            self._ramp_cache[key] = (
                (j(np.cos(row)), j(np.sin(row))),
                (j(np.cos(base)), j(np.sin(base))),
                np.asarray(adv, np.float32))
        return self._ramp_cache[key]

    def __call__(self, body: jax.Array, state, interpret: bool | None = None):
        """Channelize one raw interleaved block (2N,) -> (K, N/D) I/Q.

        Pays one device-side relayout of the raw block; live feeds should
        prefer call_cols (host-side deinterleave, zero device prep)."""
        two_d = 2 * self.decim
        n2 = body.shape[-1]
        assert n2 % (2 * self.decim) == 0, (n2, self.decim)
        n_out = n2 // two_d
        xbt = body.reshape(n_out, two_d).T         # ONE relayout, ingest width
        return self.call_cols(xbt, state, interpret)

    def call_cols(self, xbt: jax.Array, state,
                  interpret: bool | None = None):
        """Channelize from the pre-phased (2D, N/D) column layout —
        xbt[d, c] = raw[2D*c + d] — with zero device-side prep (the host
        deinterleaves during ingest framing)."""
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        n_out = xbt.shape[-1]
        assert n_out >= EXT, (n_out, EXT)
        tile = _largest_divisor_at_most(n_out, self.tile)
        assert tile % 128 == 0, (
            f"n_out {n_out} has no 128-multiple tile <= {self.tile}")
        (rr, ri), (br, bi), adv = self._tables(n_out, tile)

        pr, pi_ = jnp.cos(state["phase"]), jnp.sin(state["phase"])
        pr = jnp.pad(pr, (0, self.kp - self.k))
        pi_ = jnp.pad(pi_, (0, self.kp - self.k))
        rotc = pr[:, None] * rr - pi_[:, None] * ri      # (Kp, A)
        rots = pr[:, None] * ri + pi_[:, None] * rr
        # lane-pad the per-tile tables to the kernel's 128-wide chunk reads
        a_pad = -(-rotc.shape[1] // 128) * 128
        rotc = jnp.pad(rotc, ((0, 0), (0, a_pad - rotc.shape[1])))
        rots = jnp.pad(rots, ((0, 0), (0, a_pad - rots.shape[1])))

        i_out, q_out = _mfb_pallas_call(
            state["tail"], xbt, self._bm, rotc, rots,
            jnp.asarray(br), jnp.asarray(bi),
            kp=self.kp, n_shift=self._n_shift, t_cols=self.t_cols,
            tile=tile, compute_dtype=self.compute_dtype, interpret=interpret,
            out_dtype=self.out_dtype)
        new_state = {
            "phase": jnp.mod(state["phase"] + adv,
                             jnp.float32(2.0 * np.pi)),
            "tail": xbt[:, n_out - EXT:],
        }
        return (i_out[:self.k], q_out[:self.k]), new_state


def _largest_divisor_at_most(n: int, cap: int) -> int:
    for d in range(min(cap, n), 0, -1):
        if n % d == 0 and d % 128 == 0:
            return d
    return n

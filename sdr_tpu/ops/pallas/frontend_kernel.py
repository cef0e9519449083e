"""Fused RF front-end Pallas kernel: u8 decode + deinterleave + FIR + decimate.

The XLA mono chain is HBM-bound on the materialized float32 decode: u8 IQ
(1 byte) becomes 8 bytes of I/Q float before the channelizer conv reads it
again — 5x the fundamental traffic (measured: decode alone runs at the HBM
roofline, SURVEY §7 step 6).  This kernel keeps the stream as u8 all the way
into VMEM and fuses the whole front end:

  per (C=128, IN) u8 tile:   xf = (u8 - 128) / 128            (VPU)
                              out = xf @ A                      (MXU)

where A is a constant banded (IN x 2*OT) matrix encoding, for each of OT
decimated IF samples, the 51-tap FIR over the *interleaved* stream — column
n of the I half has h[k] at row 2*(n*D - k) + tail_len, the Q half at the
odd rows.  Channels ride the M dimension of the matmul, so the natural
(C, time) layout is preserved end to end with zero transposes.  The band
occupies ~140 of ~2700 rows per column; the dense MXU matmul wastes ~19x
FLOPs but the chain is bandwidth-bound, not FLOP-bound.

Streaming state: callers prepend the carried 2*(rf_taps-1) u8 tail
(exactly the reference's resample tail semantics, src/filter.cpp:95-102,
but in the raw interleaved domain).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _build_band_matrix(coeff: np.ndarray, decim: int, out_tile: int,
                       tail_u8: int) -> np.ndarray:
    """A[l, n] (and Q half at n+OT): h[k] at interleaved-row 2*(n*D-k)+tail."""
    taps = len(coeff)
    in_len = 2 * decim * out_tile + tail_u8
    a = np.zeros((in_len, 2 * out_tile), dtype=np.float32)
    for n in range(out_tile):
        for k in range(taps):
            l = 2 * (n * decim - k) + tail_u8
            if 0 <= l < in_len:
                a[l, n] = coeff[k]            # I (even rows)
                a[l + 1, n + out_tile] = coeff[k]  # Q (odd rows)
    return a


FIX_BITS = 14  # fixed-point fraction bits of the int8x2 coefficient limbs


def _quantize_limbs(a: np.ndarray) -> tuple[np.ndarray, np.ndarray, float]:
    """Split a float band matrix into two int8 limbs of a 15-bit
    fixed-point representation: a ~= (a1*128 + a2) * scale, a1/a2 int8.

    The int8x2 exact-integer engine (see FusedFrontend): with the u8 input
    exactly int8 (x-128) and coefficients as two int8 limbs, the MXU's
    int8 x int8 -> int32 matmuls accumulate EXACT integers — the result is
    bit-identical under ANY tiling/reduction order (integer addition is
    associative), unlike every float engine including the direct XLA f32
    conv whose last ulps depend on XLA's reduction tree.  Coefficient
    quantization to 15 bits costs ~90 dB SNR — 64 dB below the f32
    design's own windowed-sinc stop-band, transparent at the FM demod
    distortion floor.
    """
    peak = np.abs(a).max()
    s = 2.0 ** np.ceil(np.log2(peak)) if peak > 0 else 1.0
    fix = np.round(a / s * (1 << FIX_BITS)).astype(np.int32)
    hi = np.round(fix / 128.0).astype(np.int32)
    lo = fix - 128 * hi
    if np.abs(hi).max() > 127:
        # peak an exact power of two: a/s hits 1.0, fix = +-2^FIX_BITS and
        # hi = +-128 overflows int8 — give back one fixed-point bit
        s *= 2.0
        fix = np.round(a / s * (1 << FIX_BITS)).astype(np.int32)
        hi = np.round(fix / 128.0).astype(np.int32)
        lo = fix - 128 * hi
    assert np.all(np.abs(hi) <= 127) and np.all(np.abs(lo) <= 127)
    return (hi.astype(np.int8), lo.astype(np.int8),
            float(s / (1 << FIX_BITS)))


def _quantize_int8(a: np.ndarray) -> tuple[np.ndarray, float]:
    """Single-limb int8 coefficient quantization (throughput engine):
    a ~= a8 * scale, a8 int8.  ~44 dB coefficient SNR — below the int8x2
    engine's ~90 dB but far above the FM demod's ~25 dB distortion floor."""
    peak = np.abs(a).max()
    sc = (peak / 127.0) if peak > 0 else 1.0
    a8 = np.clip(np.round(a / sc), -127, 127).astype(np.int8)
    return a8, float(sc)


def _frontend_kernel(tail_ref, body_ref, a_ref, i_ref, q_ref, scratch_ref,
                     sem, *, in_len, out_tile, decim, compute_dtype,
                     sub_tiles, tail_u8, fix_scale=0.0):
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    stride = 2 * decim * out_tile

    # double-buffered input pipeline: tile t+1's HBM->VMEM copy runs while
    # tile t computes (the automatic pipeliner can't express the overlapping
    # input windows, so the copy is manual — without this it serializes
    # with the matmul).  The carried tail arrives as its OWN ref — the
    # round-3 path concatenated tail+block in XLA first, which copied the
    # entire raw input once more per step (measured 12% of the stereo
    # step); only tile 0 touches the tail, via a second small DMA.
    def body_dma(slot, idx):
        # window for tile idx >= 1 starts at idx*stride - tail_u8 in body
        # coordinates (assert stride >= tail_u8 holds: see caller); the
        # offset is written as an explicit multiple of 128 so Mosaic can
        # prove the lane-tiling divisibility of the HBM slice
        off = (idx * (stride // 128) - tail_u8 // 128) * 128
        return pltpu.make_async_copy(
            body_ref.at[:, pl.ds(off, in_len)],
            scratch_ref.at[slot], sem.at[slot, 0])

    @pl.when(t == 0)
    def _():
        pltpu.make_async_copy(tail_ref.at[:, :],
                              scratch_ref.at[0, :, pl.ds(0, tail_u8)],
                              sem.at[0, 1]).start()
        pltpu.make_async_copy(
            body_ref.at[:, pl.ds(0, in_len - tail_u8)],
            scratch_ref.at[0, :, pl.ds(tail_u8, in_len - tail_u8)],
            sem.at[0, 0]).start()

    @pl.when(t + 1 < n_t)
    def _():
        body_dma((t + 1) % 2, t + 1).start()

    @pl.when(t == 0)
    def _():
        pltpu.make_async_copy(tail_ref.at[:, :],
                              scratch_ref.at[0, :, pl.ds(0, tail_u8)],
                              sem.at[0, 1]).wait()
        pltpu.make_async_copy(
            body_ref.at[:, pl.ds(0, in_len - tail_u8)],
            scratch_ref.at[0, :, pl.ds(tail_u8, in_len - tail_u8)],
            sem.at[0, 0]).wait()

    @pl.when(t > 0)
    def _():
        body_dma(t % 2, t).wait()
    slot = t % 2
    # The band matrix wastes MXU rows ~ 2*decim*tile / (2*taps) per column;
    # splitting the tile into sub_tiles independent sub-matmuls (each over
    # its own input window) cuts the waste proportionally while the output
    # block stays a legal (C, out_tile>=128) shape.  Sub-windows overlap by
    # the tail rows only; each output still reduces exactly the same
    # nonzero terms (equivalent to ~1 ULP — only the reduction tree over
    # the band's zero rows changes; BIT-identical in int8x2 mode, where
    # the reduction is integer and therefore associative).
    ot = out_tile // sub_tiles
    sub_in = a_ref.shape[-2]
    for s in range(sub_tiles):
        # Mosaic has no direct u8->f32 cast; XOR the sign bit to reinterpret
        # the excess-128 byte as int8 (exactly x-128), then widen.  The
        # decode is EXACT in bf16 too: (x-128) in [-128,127] and /128 are
        # both representable (8 mantissa bits, power-of-two scale).
        sl = scratch_ref[slot, :, s * 2 * decim * ot:s * 2 * decim * ot
                         + sub_in]
        as_i8 = pltpu.bitcast(sl ^ jnp.uint8(0x80), jnp.int8)
        if compute_dtype == "int8x2":
            # exact-integer engine: x int8 (the decode, x128) times two
            # int8 coefficient limbs in int32 — bit-exact reduction
            acc1 = jnp.dot(as_i8, a_ref[0], preferred_element_type=jnp.int32)
            acc2 = jnp.dot(as_i8, a_ref[1], preferred_element_type=jnp.int32)
            out = (acc1 * 128 + acc2).astype(jnp.float32) * jnp.float32(
                fix_scale / 128.0)  # /128 undoes the int8 decode scaling
        elif compute_dtype == "int8":
            # throughput-integer engine: ONE int8 matmul (394 TOPS on v5e,
            # 2x bf16) on 8-bit coefficients (~44 dB, far above the FM
            # demod distortion floor); the decode is the XOR+bitcast above
            # — no widening, no scaling (the round-5 profile showed the
            # per-byte VPU decode, not DMA or the MXU, bounded this kernel)
            acc = jnp.dot(as_i8, a_ref[:, :],
                          preferred_element_type=jnp.int32)
            out = acc.astype(jnp.float32) * jnp.float32(fix_scale / 128.0)
        else:
            # the exact /128 decode scale is FOLDED INTO the band matrix (a
            # pure exponent shift — bit-identical results), so the per-byte
            # decode is XOR+bitcast+widen only
            xf = as_i8.astype(compute_dtype)
            out = jnp.dot(xf, a_ref[:, :],
                          preferred_element_type=jnp.float32)
        i_ref[:, s * ot:(s + 1) * ot] = out[:, :ot]
        q_ref[:, s * ot:(s + 1) * ot] = out[:, ot:]


def _frontend_demod_kernel(tail_ref, body_ref, a_ref, prev_ref, fm_ref,
                           misc_ref, scratch_ref, sem, *, in_len, out_tile,
                           decim, compute_dtype, sub_tiles, tail_u8,
                           fix_scale=0.0):
    """Front-end + FM discriminator in one launch.

    Same banded matmul as `_frontend_kernel`, but the decimated I/Q tiles
    never leave VMEM: the discriminator (I*dQ - Q*dI)/(I^2+Q^2)
    (ops/demod.py semantics, reference src/filter.cpp:106-133) runs on the
    tile in registers and only `fm_demod` is written to HBM — removing the
    16 B/IF-sample I/Q round-trip that bounds the unfused mono chain.

    `misc_ref` (C, 128) doubles as the cross-tile demod carry and the
    auxiliary output: col 0 = last I, col 1 = last Q (the next block's
    prev_i/prev_q), col 2 = running sum of I^2+Q^2 (RSSI without i/q).
    The grid is sequential on TPU, so the constant-index output block is
    the natural carry register.
    """
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    stride = 2 * decim * out_tile

    def body_dma(slot, idx):
        off = (idx * (stride // 128) - tail_u8 // 128) * 128
        return pltpu.make_async_copy(
            body_ref.at[:, pl.ds(off, in_len)],
            scratch_ref.at[slot], sem.at[slot, 0])

    @pl.when(t == 0)
    def _():
        pltpu.make_async_copy(tail_ref.at[:, :],
                              scratch_ref.at[0, :, pl.ds(0, tail_u8)],
                              sem.at[0, 1]).start()
        pltpu.make_async_copy(
            body_ref.at[:, pl.ds(0, in_len - tail_u8)],
            scratch_ref.at[0, :, pl.ds(tail_u8, in_len - tail_u8)],
            sem.at[0, 0]).start()
        misc_ref[:, :] = prev_ref[:, :]

    @pl.when(t + 1 < n_t)
    def _():
        body_dma((t + 1) % 2, t + 1).start()

    @pl.when(t == 0)
    def _():
        pltpu.make_async_copy(tail_ref.at[:, :],
                              scratch_ref.at[0, :, pl.ds(0, tail_u8)],
                              sem.at[0, 1]).wait()
        pltpu.make_async_copy(
            body_ref.at[:, pl.ds(0, in_len - tail_u8)],
            scratch_ref.at[0, :, pl.ds(tail_u8, in_len - tail_u8)],
            sem.at[0, 0]).wait()

    @pl.when(t > 0)
    def _():
        body_dma(t % 2, t).wait()
    slot = t % 2
    ot = out_tile // sub_tiles
    sub_in = a_ref.shape[-2]
    for s in range(sub_tiles):
        sl = scratch_ref[slot, :, s * 2 * decim * ot:s * 2 * decim * ot
                         + sub_in]
        as_i8 = pltpu.bitcast(sl ^ jnp.uint8(0x80), jnp.int8)
        if compute_dtype == "int8x2":
            acc1 = jnp.dot(as_i8, a_ref[0], preferred_element_type=jnp.int32)
            acc2 = jnp.dot(as_i8, a_ref[1], preferred_element_type=jnp.int32)
            out = (acc1 * 128 + acc2).astype(jnp.float32) * jnp.float32(
                fix_scale / 128.0)
        elif compute_dtype == "int8":
            acc = jnp.dot(as_i8, a_ref[:, :],
                          preferred_element_type=jnp.int32)
            out = acc.astype(jnp.float32) * jnp.float32(fix_scale / 128.0)
        else:
            xf = as_i8.astype(compute_dtype)  # /128 folded into a_ref
            out = jnp.dot(xf, a_ref[:, :],
                          preferred_element_type=jnp.float32)
        i_sub, q_sub = out[:, :ot], out[:, ot:]
        i_prev = jnp.concatenate([misc_ref[:, 0:1], i_sub[:, :ot - 1]],
                                 axis=1)
        q_prev = jnp.concatenate([misc_ref[:, 1:2], q_sub[:, :ot - 1]],
                                 axis=1)
        num = i_sub * (q_sub - q_prev) - q_sub * (i_sub - i_prev)
        den = i_sub * i_sub + q_sub * q_sub
        fm = jnp.where(den == 0.0, 0.0,
                       num / jnp.where(den == 0.0, 1.0, den))
        fm_ref[:, s * ot:(s + 1) * ot] = fm.astype(fm_ref.dtype)
        misc_ref[:, 0:1] = i_sub[:, ot - 1:ot]
        misc_ref[:, 1:2] = q_sub[:, ot - 1:ot]
        misc_ref[:, 2:3] = misc_ref[:, 2:3] + jnp.sum(den, axis=1,
                                                      keepdims=True)


@functools.partial(jax.jit, static_argnames=("decim", "out_tile", "interpret",
                                              "compute_dtype", "sub_tiles",
                                              "fix_scale", "out_dtype"))
def _fused_frontend_demod_call(tail, body, a, prev, *, decim, out_tile,
                               interpret, compute_dtype=jnp.float32,
                               sub_tiles=1, fix_scale=0.0,
                               out_dtype=jnp.float32):
    c, total = body.shape
    ot = out_tile // sub_tiles
    tail_u8 = a.shape[-2] - 2 * decim * ot
    in_len = 2 * decim * out_tile + tail_u8
    assert 2 * decim * out_tile >= tail_u8, (decim, out_tile, tail_u8)
    assert (2 * decim * out_tile) % 128 == 0 and tail_u8 % 128 == 0
    n_out = total // (2 * decim)
    grid = n_out // out_tile
    kernel = functools.partial(_frontend_demod_kernel, in_len=in_len,
                               out_tile=out_tile, decim=decim,
                               compute_dtype=compute_dtype,
                               sub_tiles=sub_tiles, tail_u8=tail_u8,
                               fix_scale=fix_scale)
    if compute_dtype not in ("int8x2", "int8"):
        a = a.astype(compute_dtype)
    fm, misc = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(jax.ShapeDtypeStruct((c, n_out), out_dtype),
                   jax.ShapeDtypeStruct((c, LANES), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(a.shape, lambda t: (0,) * a.ndim,
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((c, LANES), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((c, out_tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((c, LANES), lambda t: (0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((2, c, in_len), jnp.uint8),
                        pltpu.SemaphoreType.DMA((2, 2))],
        interpret=interpret,
    )(tail, body, a, prev)
    return fm, misc


@functools.partial(jax.jit, static_argnames=("decim", "out_tile", "interpret",
                                              "compute_dtype", "sub_tiles",
                                              "fix_scale"))
def _fused_frontend_call(tail, body, a, *, decim, out_tile, interpret,
                         compute_dtype=jnp.float32, sub_tiles=1,
                         fix_scale=0.0):
    c, total = body.shape
    ot = out_tile // sub_tiles
    tail_u8 = a.shape[-2] - 2 * decim * ot
    in_len = 2 * decim * out_tile + tail_u8
    assert 2 * decim * out_tile >= tail_u8, (decim, out_tile, tail_u8)
    assert (2 * decim * out_tile) % 128 == 0 and tail_u8 % 128 == 0
    n_out = total // (2 * decim)
    grid = n_out // out_tile
    kernel = functools.partial(_frontend_kernel, in_len=in_len,
                               out_tile=out_tile, decim=decim,
                               compute_dtype=compute_dtype,
                               sub_tiles=sub_tiles, tail_u8=tail_u8,
                               fix_scale=fix_scale)
    if compute_dtype not in ("int8x2", "int8"):
        a = a.astype(compute_dtype)
    i_ds, q_ds = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(jax.ShapeDtypeStruct((c, n_out), jnp.float32),
                   jax.ShapeDtypeStruct((c, n_out), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(a.shape, lambda t: (0,) * a.ndim,
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((c, out_tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((c, out_tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((2, c, in_len), jnp.uint8),
                        pltpu.SemaphoreType.DMA((2, 2))],
        interpret=interpret,
    )(tail, body, a)
    return i_ds, q_ds


class FusedFrontend:
    """Stateful fused channelizer: __call__(u8_block, tail) like two
    PolyphaseResamplers + decode, returning (i_ds, q_ds, new_tail).

    tail is the carried last 2*(taps-1) interleaved u8 samples.
    """

    def __init__(self, coeff: np.ndarray, decim: int, out_tile: int = 128,
                 compute_dtype=None, sub_tiles: int = 1, out_dtype=None):
        self.taps = len(coeff)
        self.decim = int(decim)
        self.out_tile = int(out_tile)
        # sub_tiles > 1 splits each tile's banded matmul into independent
        # sub-matmuls over shifted input windows — same outputs to ~1 ULP,
        # ~sub_tiles x less banded-zero FLOP waste; 2*(out_tile/sub_tiles)
        # must still fill the 128-lane matmul width
        self.sub_tiles = int(sub_tiles)
        assert out_tile % sub_tiles == 0 and (
            2 * out_tile // sub_tiles) % 128 == 0, (out_tile, sub_tiles)
        # bf16 mode: exact u8 decode, ~0.4% coefficient rounding (~55 dB
        # output SNR) for a 4x MXU rate and half the VMEM traffic.
        # "int8x2" mode: the exact-integer engine — coefficients as two
        # int8 limbs of a 15-bit fixed-point value (~90 dB), int32
        # accumulation: BIT-exact under any tiling (see _quantize_limbs),
        # at the MXU's int8 rate (2x bf16 on v5e).
        import jax.numpy as _jnp
        self.compute_dtype = compute_dtype or _jnp.float32
        # fm output materialization dtype (demod_call only): bf16 halves
        # the fm stream's HBM traffic in the bf16-materialization profile
        self.out_dtype = out_dtype or _jnp.float32
        # carried raw tail, rounded up to the 128-lane DMA alignment Mosaic
        # requires; rows below the FIR reach are zero in the band matrix
        self.tail_u8 = -(-(2 * (self.taps - 1)) // 128) * 128
        band = _build_band_matrix(
            np.asarray(coeff, np.float64), decim, out_tile // sub_tiles,
            self.tail_u8)
        self.fix_scale = 0.0
        if self.compute_dtype == "int8x2":
            hi, lo, self.fix_scale = _quantize_limbs(band)
            self._a = jnp.asarray(np.stack([hi, lo]))
        elif self.compute_dtype == "int8":
            a8, self.fix_scale = _quantize_int8(band)
            self._a = jnp.asarray(a8)
        else:
            # fold the exact /128 u8-decode scale into the coefficients: a
            # power-of-two exponent shift, so f32 results stay bit-identical
            # and bf16 coefficient rounding is unchanged
            self._a = jnp.asarray(band / 128.0)

    def init_state(self, batch_shape: tuple[int, ...] = ()) -> jax.Array:
        # value 128 decodes to 0.0 == zero-filled float tails
        return jnp.full(batch_shape + (self.tail_u8,), 128, dtype=jnp.uint8)

    def __call__(self, u8_block: jax.Array, tail: jax.Array,
                 interpret: bool = False):
        squeeze = u8_block.ndim == 1
        if squeeze:
            u8_block = u8_block[None]
            tail = tail[None]
        c, n = u8_block.shape
        n_out = n // (2 * self.decim)
        assert n_out % self.out_tile == 0, (
            f"IF samples per block {n_out} not divisible by tile "
            f"{self.out_tile}")
        # tail and block go to the kernel as separate refs — concatenating
        # here would copy the whole raw input once more per step
        # Mosaic u8 sublane tiling requires the channel dim to be a multiple
        # of 8; pad small batches with 128-bytes (decode to 0.0)
        new_tail = u8_block[..., n - self.tail_u8:]
        c_pad = -(-c // 8) * 8
        if c_pad != c:
            pad = jnp.full((c_pad - c, n), 128, jnp.uint8)
            u8_block = jnp.concatenate([u8_block, pad], axis=0)
            tail = jnp.concatenate(
                [tail, jnp.full((c_pad - c, self.tail_u8), 128, jnp.uint8)],
                axis=0)
        i_ds, q_ds = _fused_frontend_call(tail, u8_block, self._a,
                                          decim=self.decim,
                                          out_tile=self.out_tile,
                                          interpret=interpret,
                                          compute_dtype=self.compute_dtype,
                                          sub_tiles=self.sub_tiles,
                                          fix_scale=self.fix_scale)
        if c_pad != c:
            i_ds, q_ds = i_ds[:c], q_ds[:c]
        if squeeze:
            i_ds, q_ds, new_tail = i_ds[0], q_ds[0], new_tail[0]
        return i_ds, q_ds, new_tail

    def demod_call(self, u8_block: jax.Array, tail: jax.Array,
                   prev_i: jax.Array, prev_q: jax.Array,
                   interpret: bool = False):
        """Front-end + FM discriminator in one kernel launch.

        Returns (fm_demod, new_tail, new_prev_i, new_prev_q, power_sum)
        where power_sum = sum(I^2+Q^2) over the block's IF samples (for
        RSSI) — the decimated I/Q never touch HBM.
        """
        squeeze = u8_block.ndim == 1
        if squeeze:
            u8_block = u8_block[None]
            tail = tail[None]
            prev_i = prev_i[None]
            prev_q = prev_q[None]
        c, n = u8_block.shape
        n_out = n // (2 * self.decim)
        assert n_out % self.out_tile == 0, (
            f"IF samples per block {n_out} not divisible by tile "
            f"{self.out_tile}")
        new_tail = u8_block[..., n - self.tail_u8:]
        c_pad = -(-c // 8) * 8
        if c_pad != c:
            pad = jnp.full((c_pad - c, n), 128, jnp.uint8)
            u8_block = jnp.concatenate([u8_block, pad], axis=0)
            tail = jnp.concatenate(
                [tail, jnp.full((c_pad - c, self.tail_u8), 128, jnp.uint8)],
                axis=0)
        prev = jnp.zeros((c_pad, LANES), jnp.float32)
        prev = prev.at[:c, 0].set(prev_i).at[:c, 1].set(prev_q)
        fm, misc = _fused_frontend_demod_call(
            tail, u8_block, self._a, prev, decim=self.decim,
            out_tile=self.out_tile, interpret=interpret,
            compute_dtype=self.compute_dtype, sub_tiles=self.sub_tiles,
            fix_scale=self.fix_scale, out_dtype=self.out_dtype)
        fm, misc = fm[:c], misc[:c]
        new_prev_i, new_prev_q, power = misc[:, 0], misc[:, 1], misc[:, 2]
        if squeeze:
            fm, new_tail = fm[0], new_tail[0]
            new_prev_i, new_prev_q = new_prev_i[0], new_prev_q[0]
            power = power[0]
        return fm, new_tail, new_prev_i, new_prev_q, power

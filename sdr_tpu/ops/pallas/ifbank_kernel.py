"""Fused IF-bank Pallas kernel: every post-demod FIR of the stereo+RDS
chain in one VMEM pass.

The XLA path runs four stride-1 51-tap FIRs over the demodulated IF
(stereo channel 22-54 kHz + pilot 18.5-19.5 kHz + RDS channel 54-60 kHz
via MultiFIR, then the squaring nonlinearity and the 113.5-114.5 kHz
carrier BPF — reference src/project.cpp:162-165,245-255).  Measured on
v5e, XLA's conv lowering for these single-input-channel shapes never
reaches the MXU (bf16 == f32 throughput) and the stages dominate the
stereo+RDS step once the PLL is feedforward.  This kernel restructures the
whole group as banded matmuls on (C, tile) blocks:

  window (C, OT+ctx) --A_cp-->  [channel | pilot]            (C, 2*OT)
  window (C, OT+ctx) --A_re-->  rds_channel extended         (C, OT+T-1)
  square (VPU)                                               (C, OT+T-1)
  squared             --A_ca->  carrier_in                   (C, OT)

where the band matrices hold the FIR taps on shifted diagonals (zero
elsewhere) and the rds_channel is computed T-1 samples into the past so
the carrier BPF's own context never needs a cross-tile carry — the only
streaming state is the caller's carried fm tail (ctx = 128 raw samples,
covering 2*(taps-1)).  Channels ride the matmul M dimension; bf16 mode
casts windows + bands (f32 accumulation, ~45-50 dB per-conv SNR).

Bit-consistency vs the XLA MultiFIR path is to reduction-order (~1 ULP);
tested in tests/test_pallas.py.

Round-4 additions: sub-tiled band matmuls (the Toeplitz-shared matrices
ride shifted windows, cutting the dense-band K ~sub_tiles x), the carried
tail as its OWN DMA ref (a caller-side concat would copy the whole fm
stream), out_dtype=bf16 materialization, and FusedIFBankMix — the
feedforward-carrier variant that accumulates the estimators' per-window
MIX sums in-kernel so the pilot / squared-carrier streams never reach
HBM (pair with ops/pll.pll_feedforward_from_sums).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CTX = 128  # carried fm context (raw IF samples); covers taps <= 65


def _band(coeff: np.ndarray, in_rows: int, n_out: int,
          out_offset: int) -> np.ndarray:
    """Band matrix A[m, n] = h[n - out_offset ... ]: window col m holds
    input sample (tile_start + m - CTX); output col n is the FIR at
    position (tile_start + n - out_offset)."""
    taps = len(coeff)
    a = np.zeros((in_rows, n_out), np.float32)
    for n in range(n_out):
        pos = n - out_offset          # output position rel. tile start
        for k in range(taps):
            m = pos - k + CTX
            if 0 <= m < in_rows:
                a[m, n] = coeff[k]
    return a


def _ifbank_kernel(tail_ref, body_ref, acp_ref, are_ref, aca_ref, chan_ref,
                   pilot_ref, rdsch_ref, carr_ref, scratch_ref, sem, *,
                   in_len, out_tile, ext, compute_dtype, sub_tiles):
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    stride = out_tile

    # tail and fm body arrive as separate refs (a caller-side concat would
    # copy the whole fm stream); only tile 0 reads the tail
    def body_dma(slot, idx):
        # offset as an explicit multiple of 128 for Mosaic's divisibility
        # prover (stride % 128 == 0 asserted by the caller; CTX = 128)
        off = (idx * (stride // 128) - CTX // 128) * 128
        return pltpu.make_async_copy(
            body_ref.at[:, pl.ds(off, in_len)],
            scratch_ref.at[slot], sem.at[slot, 0])

    @pl.when(t == 0)
    def _():
        pltpu.make_async_copy(tail_ref.at[:, :],
                              scratch_ref.at[0, :, pl.ds(0, CTX)],
                              sem.at[0, 1]).start()
        pltpu.make_async_copy(
            body_ref.at[:, pl.ds(0, in_len - CTX)],
            scratch_ref.at[0, :, pl.ds(CTX, in_len - CTX)],
            sem.at[0, 0]).start()

    @pl.when(t + 1 < n_t)
    def _():
        body_dma((t + 1) % 2, t + 1).start()

    @pl.when(t == 0)
    def _():
        pltpu.make_async_copy(tail_ref.at[:, :],
                              scratch_ref.at[0, :, pl.ds(0, CTX)],
                              sem.at[0, 1]).wait()
        pltpu.make_async_copy(
            body_ref.at[:, pl.ds(0, in_len - CTX)],
            scratch_ref.at[0, :, pl.ds(CTX, in_len - CTX)],
            sem.at[0, 0]).wait()

    @pl.when(t > 0)
    def _():
        body_dma(t % 2, t).wait()
    # The band matrices are Toeplitz-shift invariant: sub-tile s reuses the
    # SAME matrices over the window advanced by s*ot samples, so splitting
    # the tile into sub_tiles sub-matmuls cuts the dense-band K dimension
    # (and its zero-FLOP waste) ~sub_tiles x at identical outputs (only the
    # all-zero rows leave the reduction).
    ot = out_tile // sub_tiles
    sub_in = ot + CTX
    for s in range(sub_tiles):
        w = scratch_ref[t % 2, :, s * ot:s * ot + sub_in].astype(
            compute_dtype)                              # (C, ot+CTX)
        cp = jnp.dot(w, acp_ref[:, :], preferred_element_type=jnp.float32)
        odt = chan_ref.dtype
        chan_ref[:, s * ot:(s + 1) * ot] = cp[:, :ot].astype(odt)
        pilot_ref[:, s * ot:(s + 1) * ot] = cp[:, ot:].astype(odt)
        re = jnp.dot(w, are_ref[:, :], preferred_element_type=jnp.float32)
        rdsch_ref[:, s * ot:(s + 1) * ot] = re[:, ext:].astype(odt)
        sq = (re * re).astype(compute_dtype)            # (C, ot+ext)
        carr_ref[:, s * ot:(s + 1) * ot] = jnp.dot(
            sq, aca_ref[:, :], preferred_element_type=jnp.float32
        ).astype(odt)


@functools.partial(jax.jit, static_argnames=("out_tile", "ext", "interpret",
                                             "compute_dtype", "sub_tiles",
                                             "out_dtype"))
def _ifbank_call(tail, body, acp, are, aca, *, out_tile, ext, interpret,
                 compute_dtype=jnp.float32, sub_tiles=1,
                 out_dtype=jnp.float32):
    c, n_out = body.shape
    in_len = out_tile + CTX
    assert out_tile >= CTX and out_tile % 128 == 0
    grid = n_out // out_tile
    kernel = functools.partial(_ifbank_kernel, in_len=in_len,
                               out_tile=out_tile, ext=ext,
                               compute_dtype=compute_dtype,
                               sub_tiles=sub_tiles)
    acp = acp.astype(compute_dtype)
    are = are.astype(compute_dtype)
    aca = aca.astype(compute_dtype)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=tuple(jax.ShapeDtypeStruct((c, n_out), out_dtype)
                        for _ in range(4)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(a.shape, lambda t: (0, 0), memory_space=pltpu.VMEM)
           for a in (acp, are, aca)],
        out_specs=tuple(pl.BlockSpec((c, out_tile), lambda t: (0, t),
                                     memory_space=pltpu.VMEM)
                        for _ in range(4)),
        scratch_shapes=[pltpu.VMEM((2, c, in_len), body.dtype),
                        pltpu.SemaphoreType.DMA((2, 2))],
        interpret=interpret,
    )(tail, body, acp, are, aca)
    return outs


class FusedIFBank:
    """Stateful fused IF filter bank for the stereo+RDS chain.

    __call__(fm, tail) -> (channel, pilot, rds_channel, carrier_in,
    new_tail); tail = carried last CTX fm samples (zeros initially,
    matching zero-filled FIR tails)."""

    def __init__(self, chan_coeff, pilot_coeff, rds_coeff, carr_coeff,
                 out_tile: int = 512, compute_dtype=None,
                 sub_tiles: int = 4, out_dtype=None):
        taps = max(len(c) for c in (chan_coeff, pilot_coeff, rds_coeff,
                                    carr_coeff))
        assert 2 * (taps - 1) <= CTX, f"taps {taps} exceeds CTX {CTX}"
        self.taps = taps
        self.out_tile = int(out_tile)
        # sub_tiles splits each tile into independent sub-matmuls over
        # shifted windows (band matrices are Toeplitz-shift invariant and
        # shared): K shrinks from out_tile+CTX to ot+CTX, cutting the
        # dense-band zero-FLOP waste ~sub_tiles x.  2*ot must still fill
        # the 128-lane matmul width.  Outputs identical to ~1 ULP (only
        # all-zero band rows leave each reduction).
        self.sub_tiles = int(sub_tiles)
        ot = self.out_tile // self.sub_tiles
        assert self.out_tile % self.sub_tiles == 0 and (2 * ot) % 128 == 0, (
            out_tile, sub_tiles)
        self.compute_dtype = compute_dtype or jnp.float32
        # out_dtype=bf16: materialize the four output streams at half
        # width (the bf16-materialization profile — consumers compute in
        # bf16 anyway, so this only removes f32<->bf16 round trips of
        # values already rounded by the compute profile)
        self.out_dtype = out_dtype or jnp.float32
        ext = taps - 1
        self.ext = ext
        in_rows = ot + CTX
        acp = np.concatenate([
            _band(np.asarray(chan_coeff, np.float64), in_rows, ot, 0),
            _band(np.asarray(pilot_coeff, np.float64), in_rows, ot, 0)],
            axis=1)
        are = _band(np.asarray(rds_coeff, np.float64), in_rows,
                    ot + ext, ext)
        # carrier band consumes the squared extended rds stream: its row m
        # holds position (sub-tile + m - ext), so the diagonal sits at
        # m = n - k + ext (same derivation as _band with CTX -> ext)
        aca = np.zeros((ot + ext, ot), np.float32)
        carr = np.asarray(carr_coeff, np.float64)
        for n in range(ot):
            for k in range(len(carr)):
                m = n - k + ext
                if 0 <= m < ot + ext:
                    aca[m, n] = carr[k]
        self._acp = jnp.asarray(acp)
        self._are = jnp.asarray(are)
        self._aca = jnp.asarray(aca)

    def init_state(self, batch_shape: tuple[int, ...] = ()) -> jax.Array:
        # the carried fm tail lives in the stream's materialization dtype
        dt = (jnp.bfloat16 if self.out_dtype == jnp.bfloat16
              else jnp.float32)
        return jnp.zeros(batch_shape + (CTX,), dt)

    def __call__(self, fm: jax.Array, tail: jax.Array,
                 interpret: bool = False):
        squeeze = fm.ndim == 1
        if squeeze:
            fm = fm[None]
            tail = tail[None]
        c, n = fm.shape
        assert n % self.out_tile == 0, (
            f"IF block {n} not divisible by tile {self.out_tile}")
        tail = tail.astype(fm.dtype)
        new_tail = fm[..., n - CTX:]
        c_pad = -(-c // 8) * 8
        if c_pad != c:
            fm = jnp.concatenate(
                [fm, jnp.zeros((c_pad - c, n), fm.dtype)], axis=0)
            tail = jnp.concatenate(
                [tail, jnp.zeros((c_pad - c, CTX), fm.dtype)], axis=0)
        chan, pilot, rdsch, carr = _ifbank_call(
            tail, fm, self._acp, self._are, self._aca,
            out_tile=self.out_tile, ext=self.ext, interpret=interpret,
            compute_dtype=self.compute_dtype, sub_tiles=self.sub_tiles,
            out_dtype=self.out_dtype)
        if c_pad != c:
            chan, pilot = chan[:c], pilot[:c]
            rdsch, carr = rdsch[:c], carr[:c]
        if squeeze:
            chan, pilot = chan[0], pilot[0]
            rdsch, carr, new_tail = rdsch[0], carr[0], new_tail[0]
        return chan, pilot, rdsch, carr, new_tail


def _ifbank_mix_kernel(tail_ref, body_ref, acp_ref, are_ref, aca_ref,
                       rcp_ref, rsp_ref, rcr_ref, rsr_ref,
                       chan_ref, rdsch_ref, zpr_ref, zpi_ref, zrr_ref,
                       zri_ref, scratch_ref, sem, *, in_len, out_tile, ext,
                       compute_dtype, sub_tiles, window):
    """IF bank + in-kernel feedforward MIX: the pilot and the squared
    RDS carrier never reach HBM.

    The feedforward carrier estimator only needs per-window coherent sums
    Z_c = sum x_i e^{-j ramp_i} of its input (ops/pll.py _ff_finish_1d) —
    so instead of materializing pilot and carrier_in (two full-rate
    streams written + re-read per step), this kernel dots each computed
    sub-tile against the ramp-table slice and accumulates the (C, n_win)
    sums as small outputs.  The stereo channel and RDS channel streams
    (actually consumed at full rate downstream) are emitted as before.
    """
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    stride = out_tile

    def body_dma(slot, idx):
        off = (idx * (stride // 128) - CTX // 128) * 128
        return pltpu.make_async_copy(
            body_ref.at[:, pl.ds(off, in_len)],
            scratch_ref.at[slot], sem.at[slot, 0])

    @pl.when(t == 0)
    def _():
        pltpu.make_async_copy(tail_ref.at[:, :],
                              scratch_ref.at[0, :, pl.ds(0, CTX)],
                              sem.at[0, 1]).start()
        pltpu.make_async_copy(
            body_ref.at[:, pl.ds(0, in_len - CTX)],
            scratch_ref.at[0, :, pl.ds(CTX, in_len - CTX)],
            sem.at[0, 0]).start()

    @pl.when(t + 1 < n_t)
    def _():
        body_dma((t + 1) % 2, t + 1).start()

    @pl.when(t == 0)
    def _():
        pltpu.make_async_copy(tail_ref.at[:, :],
                              scratch_ref.at[0, :, pl.ds(0, CTX)],
                              sem.at[0, 1]).wait()
        pltpu.make_async_copy(
            body_ref.at[:, pl.ds(0, in_len - CTX)],
            scratch_ref.at[0, :, pl.ds(CTX, in_len - CTX)],
            sem.at[0, 0]).wait()

    @pl.when(t > 0)
    def _():
        body_dma(t % 2, t).wait()

    ot = out_tile // sub_tiles
    wpt = out_tile // window            # windows per tile
    subs_per_win = window // ot
    parts_r_p = [[] for _ in range(wpt)]
    parts_i_p = [[] for _ in range(wpt)]
    parts_r_r = [[] for _ in range(wpt)]
    parts_i_r = [[] for _ in range(wpt)]
    for s in range(sub_tiles):
        w = scratch_ref[t % 2, :, s * ot:s * ot + ot + CTX].astype(
            compute_dtype)
        cp = jnp.dot(w, acp_ref[:, :], preferred_element_type=jnp.float32)
        odt = chan_ref.dtype
        chan_ref[:, s * ot:(s + 1) * ot] = cp[:, :ot].astype(odt)
        pilot_sub = cp[:, ot:]                          # (C, ot) f32
        re = jnp.dot(w, are_ref[:, :], preferred_element_type=jnp.float32)
        rdsch_ref[:, s * ot:(s + 1) * ot] = re[:, ext:].astype(odt)
        sq = (re * re).astype(compute_dtype)
        carr_sub = jnp.dot(sq, aca_ref[:, :],
                           preferred_element_type=jnp.float32)
        sl = pl.ds(s * ot, ot)
        wi = s // subs_per_win
        parts_r_p[wi].append(jnp.sum(pilot_sub * rcp_ref[0, sl],
                                     axis=1, keepdims=True))
        parts_i_p[wi].append(jnp.sum(pilot_sub * (-rsp_ref[0, sl]),
                                     axis=1, keepdims=True))
        parts_r_r[wi].append(jnp.sum(carr_sub * rcr_ref[0, sl],
                                     axis=1, keepdims=True))
        parts_i_r[wi].append(jnp.sum(carr_sub * (-rsr_ref[0, sl]),
                                     axis=1, keepdims=True))
    # z outputs are (n_tiles*8, C) row-major: each tile owns an (8, C)
    # block (sublane 8 / lane C satisfies Mosaic's block rules; dynamic
    # single-COLUMN stores do not lower) with rows 0..wpt used — the
    # caller slices and transposes the tiny result
    for wi in range(wpt):
        zpr_ref[wi, :] = sum(parts_r_p[wi])[:, 0]
        zpi_ref[wi, :] = sum(parts_i_p[wi])[:, 0]
        zrr_ref[wi, :] = sum(parts_r_r[wi])[:, 0]
        zri_ref[wi, :] = sum(parts_i_r[wi])[:, 0]


@functools.partial(jax.jit, static_argnames=("out_tile", "ext", "interpret",
                                             "compute_dtype", "sub_tiles",
                                             "out_dtype", "window"))
def _ifbank_mix_call(tail, body, acp, are, aca, rcp, rsp, rcr, rsr, *,
                     out_tile, ext, interpret, compute_dtype=jnp.float32,
                     sub_tiles=1, out_dtype=jnp.float32, window=256):
    c, n_out = body.shape
    in_len = out_tile + CTX
    assert out_tile >= CTX and out_tile % 128 == 0
    assert out_tile % window == 0 and window % (out_tile // sub_tiles) == 0
    # per-tile z-sum output blocks are fixed at (8, c): rows 0..wpt-1 used
    assert out_tile // window <= 8, (
        f"out_tile/window = {out_tile // window} windows per tile exceeds "
        "the (8, c) per-tile z-sum block")
    grid = n_out // out_tile
    n_win = n_out // window
    wpt = out_tile // window
    kernel = functools.partial(_ifbank_mix_kernel, in_len=in_len,
                               out_tile=out_tile, ext=ext,
                               compute_dtype=compute_dtype,
                               sub_tiles=sub_tiles, window=window)
    acp = acp.astype(compute_dtype)
    are = are.astype(compute_dtype)
    aca = aca.astype(compute_dtype)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(jax.ShapeDtypeStruct((c, n_out), out_dtype),
                   jax.ShapeDtypeStruct((c, n_out), out_dtype))
        + tuple(jax.ShapeDtypeStruct((grid * 8, c), jnp.float32)
                for _ in range(4)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(a.shape, lambda t: (0, 0), memory_space=pltpu.VMEM)
           for a in (acp, are, aca)]
        + [pl.BlockSpec((1, out_tile), lambda t: (0, t),
                        memory_space=pltpu.VMEM) for _ in range(4)],
        out_specs=(pl.BlockSpec((c, out_tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((c, out_tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM))
        + tuple(pl.BlockSpec((8, c), lambda t: (t, 0),
                             memory_space=pltpu.VMEM) for _ in range(4)),
        scratch_shapes=[pltpu.VMEM((2, c, in_len), body.dtype),
                        pltpu.SemaphoreType.DMA((2, 2))],
        interpret=interpret,
    )(tail, body, acp, are, aca, rcp, rsp, rcr, rsr)
    chan, rdsch, zpr8, zpi8, zrr8, zri8 = outs

    def unpack(z8):
        # (grid*8, c) -> rows 0..wpt of each tile -> (c, n_win)
        return z8.reshape(grid, 8, c)[:, :wpt].reshape(n_win, c).T
    return (chan, rdsch, unpack(zpr8), unpack(zpi8), unpack(zrr8),
            unpack(zri8))


class FusedIFBankMix(FusedIFBank):
    """FusedIFBank variant for the feedforward-carrier chain: emits the
    stereo/RDS channel streams plus per-window coherent MIX sums of the
    pilot and the recovered-carrier input — those two streams never reach
    HBM.  Pair with ops/pll.pll_feedforward_from_sums.
    """

    def __init__(self, *coeffs, window: int = 256, pilot_freq: float,
                 rds_carrier_freq: float, fs: float, **kw):
        super().__init__(*coeffs, **kw)
        self.window = int(window)
        self.pilot_freq = float(pilot_freq)
        self.rds_carrier_freq = float(rds_carrier_freq)
        self.fs = float(fs)
        self._ramp_cache: dict[int, tuple] = {}

    def _ramps(self, n_out: int):
        """Flat trace-time f64-exact ramp tables matching ops/pll._ff_tables
        for each engine (same wrap modulus, so the finisher's synthesis
        tables line up exactly).

        The cache holds HOST arrays: a jnp.asarray created while tracing
        would be a trace-local constant whose reuse in a different jit
        trace raises UnexpectedTracerError (same hazard as
        ops/channelizer._phase_tables)."""
        if n_out not in self._ramp_cache:
            from sdr_tpu.ops.pll import _wrap_modulus
            tabs = []
            for freq, scale in ((self.pilot_freq, 2.0),
                                (self.rds_carrier_freq, 0.5)):
                wmod = _wrap_modulus(scale)
                ramp = (2.0 * np.pi * (freq / self.fs)
                        * np.arange(n_out, dtype=np.float64)) % wmod
                tabs.append((np.asarray(np.cos(ramp), np.float32)[None],
                             np.asarray(np.sin(ramp), np.float32)[None]))
            self._ramp_cache[n_out] = tuple(tabs)
        return self._ramp_cache[n_out]

    def mix_call(self, fm: jax.Array, tail: jax.Array,
                 interpret: bool = False):
        squeeze = fm.ndim == 1
        if squeeze:
            fm = fm[None]
            tail = tail[None]
        c, n = fm.shape
        assert n % self.out_tile == 0 and n % self.window == 0, (n,)
        (rcp, rsp), (rcr, rsr) = self._ramps(n)
        tail = tail.astype(fm.dtype)
        new_tail = fm[..., n - CTX:]
        c_pad = -(-c // 8) * 8
        if c_pad != c:
            fm = jnp.concatenate(
                [fm, jnp.zeros((c_pad - c, n), fm.dtype)], axis=0)
            tail = jnp.concatenate(
                [tail, jnp.zeros((c_pad - c, CTX), fm.dtype)], axis=0)
        chan, rdsch, zpr, zpi, zrr, zri = _ifbank_mix_call(
            tail, fm, self._acp, self._are, self._aca, rcp, rsp, rcr, rsr,
            out_tile=self.out_tile, ext=self.ext, interpret=interpret,
            compute_dtype=self.compute_dtype, sub_tiles=self.sub_tiles,
            out_dtype=self.out_dtype, window=self.window)
        if c_pad != c:
            chan, rdsch = chan[:c], rdsch[:c]
            zpr, zpi, zrr, zri = zpr[:c], zpi[:c], zrr[:c], zri[:c]
        if squeeze:
            chan, rdsch, new_tail = chan[0], rdsch[0], new_tail[0]
            zpr, zpi, zrr, zri = zpr[0], zpi[0], zrr[0], zri[0]
        return chan, rdsch, (zpr, zpi), (zrr, zri), new_tail

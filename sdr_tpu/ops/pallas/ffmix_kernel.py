"""Fused feedforward-carrier SYNTHESIZE + mixer Pallas kernel.

The XLA lowering of the feedforward synthesis (ops/pll.py _ff_finish_1d)
materializes the per-window scalar broadcasts: under the 128-channel vmap,
`off[:, None]` and `slope[:, None] * rel` become standalone
(C, n_win, window) f32 broadcast ops plus {0,1}->{1,0} layout copies of
the full IF-rate stream — four ops of ~590 us each at the production
shape, roughly a third of the whole stereo+RDS step (round-5 profile).
The synthesized NCOs then round-trip HBM to meet the mixers.

This kernel runs both engines' synthesis and both mixers in one pass over
the (C, tile) stream blocks: per window, the scalar (off, slope) pair is
selected from small (C, n_win) tables (aligned-chunk + iota-mask reduce —
the same pattern as the channelizer's rotation phasors), theta is built
in-register from the host-precomputed scaled ramp row, and the cos feeds
the mixer directly:

    mixed_s[c, i] = 2 * channel[c, i]     * cos(rampS[i] + offS_c + slpS_c*rel)
    mixed_r[c, i] = 2 * rds_delayed[c, i] * cos(rampR[i] + offR_c + slpR_c*rel)

The NCO streams and the broadcast intermediates never exist in HBM; the
only full-rate traffic is reading the two channel streams and writing the
two mixed streams.  nco_scale and phase_adjust are folded into the ramp
tables and the off/slope parameters host-side (cos-argument association
differs from the unfused path by float rounding only; equivalence is
gated by tolerance in tests/test_pallas.py).

Reference semantics carried through: mixer x2 gain (src/filter.cpp:176-184)
and the synthesis math of ops/pll.py pll_feedforward (whose estimator the
caller runs via pll_ff_params_from_sums).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


EXT = 128  # left-context columns carried for the in-kernel RDS delay


def _ffmix_kernel(rtail_ref, rleft_ref, chan_ref, rds_ref, ramps_ref,
                  rampr_ref, offs_ref, slps_ref, offr_ref, slpr_ref,
                  exp_ref, ms_ref, mr_ref, *, wpt, window, delay, tile):
    t = pl.program_id(0)
    # the reference's RDS all-pass delay (src/project.cpp:260-266) is a
    # static shift: delayed[i] = rds[i - delay].  Realize it from the
    # left-context window (previous EXT columns of the stream — clamped
    # block for t >= 1, carried-tail operand for t == 0) with ONE lane
    # roll, so the delayed stream never materializes in HBM and the
    # caller's delay_line concat+slice pass disappears.
    left = jnp.where(t == 0, rtail_ref[:, :], rleft_ref[:, :])
    rbuf = jnp.concatenate([left, rds_ref[:, :]],
                           axis=1).astype(jnp.float32)  # (C, EXT+tile)
    width = EXT + tile
    rdsd = pltpu.roll(rbuf, shift=width - (EXT - delay),
                      axis=1)[:, :tile]                 # (C, tile)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    # per-tile params: select the wpt per-window scalars (aligned-chunk +
    # iota-mask), then expand each scalar across its window's lanes with a
    # constant 0/1 (wpt, tile) matrix on the MXU (E[w, j] = [j//W == w];
    # pltpu.repeat is TILE-wise, not elementwise) so the whole tile is ONE
    # (C, tile) elementwise pass — the per-window loop formulation spent
    # more on small-op overhead than on the cosines (cos measured ~copy
    # speed on the VPU)
    def params(ref):
        cols = []
        for w in range(wpt):
            wg = t * wpt + w
            ck = (wg // 128) * 128      # provably 128-aligned chunk start
            m = (lane == wg % 128).astype(jnp.float32)
            cols.append(jnp.sum(ref[:, pl.ds(ck, 128)] * m, axis=1,
                                keepdims=True))         # (C, 1)
        return jnp.dot(jnp.concatenate(cols, axis=1), exp_ref[:, :],
                       preferred_element_type=jnp.float32)   # (C, tile)

    o_s, s_s = params(offs_ref), params(slps_ref)       # (C, tile)
    o_r, s_r = params(offr_ref), params(slpr_ref)
    rs = ramps_ref[pl.ds(t, 1), :]                      # (1, tile)
    rr = rampr_ref[pl.ds(t, 1), :]
    # rel pattern repeats per window: rebuild from a tile-long iota mod W
    rel = ((jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) % window)
           .astype(jnp.float32) - jnp.float32((window - 1) / 2.0))
    nco_s = jnp.cos(rs + o_s + s_s * rel)               # (C, tile)
    nco_r = jnp.cos(rr + o_r + s_r * rel)
    ms_ref[:, :] = (2.0 * chan_ref[:, :].astype(jnp.float32)
                    * nco_s).astype(ms_ref.dtype)
    mr_ref[:, :] = (2.0 * rdsd * nco_r).astype(mr_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window", "tile", "interpret",
                                             "out_dtype", "delay"))
def _ffmix_call(rds_tail, chan, rds, ramps, rampr, offs, slps, offr, slpr,
                *, window, tile, interpret, delay, out_dtype=jnp.float32):
    c, n = chan.shape
    assert tile % window == 0 and n % tile == 0, (tile, window, n)
    assert 0 <= delay <= EXT and tile % EXT == 0, (delay, tile)
    wpt = tile // window
    grid = n // tile
    kernel = functools.partial(_ffmix_kernel, wpt=wpt, window=window,
                               delay=delay, tile=tile)
    ramps = ramps.reshape(grid, tile)
    rampr = rampr.reshape(grid, tile)
    expand = jnp.asarray(np.kron(np.eye(wpt, dtype=np.float32),
                                 np.ones((1, window), np.float32)))
    full = lambda a: pl.BlockSpec(a.shape, lambda t: (0, 0),
                                  memory_space=pltpu.VMEM)
    main = pl.BlockSpec((c, tile), lambda t: (0, t),
                        memory_space=pltpu.VMEM)
    ms, mr = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(jax.ShapeDtypeStruct((c, n), out_dtype),) * 2,
        in_specs=[
            pl.BlockSpec((c, EXT), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, EXT),
                         lambda t: (0, jnp.maximum(t * (tile // EXT) - 1, 0)),
                         memory_space=pltpu.VMEM),
            main, main,
            full(ramps), full(rampr),
            full(offs), full(slps), full(offr), full(slpr),
            full(expand),
        ],
        out_specs=(pl.BlockSpec((c, tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM),) * 2,
        interpret=interpret,
    )(rds_tail, rds, chan, rds, ramps, rampr, offs, slps, offr, slpr,
      expand)
    return ms, mr


def _scaled_ramp(n: int, window: int, freq: float, fs: float,
                 nco_scale: float, phase_adjust: float) -> np.ndarray:
    """Host-f64 (n_win, window) table of scale*ramp + adjust (the constant
    part of the cos argument; same ramp as pll._ff_tables ramp_mod)."""
    from sdr_tpu.ops.pll import _wrap_modulus
    wmod_f = _wrap_modulus(nco_scale)
    w0_f64 = 2.0 * np.pi * (float(freq) / float(fs))
    ramp = ((w0_f64 * np.arange(n, dtype=np.float64)) % wmod_f
            ).reshape(n // window, window)
    return np.asarray(ramp * nco_scale + phase_adjust, np.float32)


def ffmix(channel, rds_channel, rds_tail, params_s, params_r, *, n: int,
          window: int, pilot_freq: float, rds_freq: float, fs: float,
          delay: int, stereo_scale: float = 2.0, rds_scale: float = 0.5,
          phase_adjust: float = 0.0, tile: int | None = None,
          out_dtype=jnp.float32, interpret: bool | None = None):
    """Synthesize both carriers, apply the RDS all-pass delay, and mix —
    one fused pass.

    channel / rds_channel: (C, n) IF-rate streams (any float dtype).
    rds_tail: (C, EXT) carried last columns of the previous block's
      rds_channel (the in-kernel delay's cross-block context).
    delay: the reference's RDS channel delay in samples (<= EXT).
    params_s / params_r: (off, slope) pairs (C, n_win) from
      pll_ff_params_from_sums for the pilot (nco_scale=2) and RDS carrier
      (nco_scale=0.5) engines.
    Returns (mixed_stereo, rds_baseband), both (C, n) in out_dtype, equal
    to 2*channel*nco_s and 2*delayed(rds_channel)*nco_r.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, n_ = channel.shape
    channel = channel.reshape(-1, n_)
    rds_channel = rds_channel.reshape(-1, n_)
    rds_tail = rds_tail.reshape(-1, rds_tail.shape[-1])
    params_s = tuple(p.reshape(-1, p.shape[-1]) for p in params_s)
    params_r = tuple(p.reshape(-1, p.shape[-1]) for p in params_r)
    rds_tail = rds_tail.astype(rds_channel.dtype)
    n_win = n // window
    if tile is None:
        tile = _largest_window_multiple(n, window, 4096)
    ramps = jnp.asarray(_scaled_ramp(n, window, pilot_freq, fs,
                                     stereo_scale, phase_adjust))
    rampr = jnp.asarray(_scaled_ramp(n, window, rds_freq, fs, rds_scale,
                                     0.0))
    ncp = -(-n_win // 128) * 128
    pad = lambda a: jnp.pad(a, ((0, 0), (0, ncp - n_win)))
    off_s, slp_s = params_s
    off_r, slp_r = params_r
    # fold the per-engine nco_scale (and adjust, already in the ramp) into
    # the per-window scalars so the kernel's cos argument is one affine
    offs = pad(off_s * jnp.float32(stereo_scale))
    slps = pad(slp_s * jnp.float32(stereo_scale))
    offr = pad(off_r * jnp.float32(rds_scale))
    slpr = pad(slp_r * jnp.float32(rds_scale))
    ms, mr = _ffmix_call(rds_tail, channel, rds_channel, ramps, rampr,
                         offs, slps, offr, slpr, window=window, tile=tile,
                         interpret=interpret, delay=delay,
                         out_dtype=out_dtype)
    return ms.reshape(*lead, n_), mr.reshape(*lead, n_)


def _largest_window_multiple(n: int, window: int, cap: int) -> int:
    for k in range(min(cap // window, n // window), 0, -1):
        if n % (k * window) == 0:
            return k * window
    return window

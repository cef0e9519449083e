"""Pallas TPU kernel for the PLL sequential recurrence.

The PLL is the receiver's only true sequential bottleneck (SURVEY §7
hard-part 1): 240k strictly-ordered iterations per second of IF signal.
Under `lax.scan` each iteration is a while-loop step with scheduling
overhead; this kernel runs the whole recurrence as one `fori_loop` inside
VMEM with the channel batch laid across the 128-lane axis, so each
iteration is a handful of row-vector VPU ops (atan2/sin/cos) with zero
inter-step overhead.

Layout: time-major (N, C) with C padded to 128 lanes.  Long blocks are
chunked by an outer lax.scan at `chunk` rows so the VMEM working set stays
bounded (chunk=4096: 4096x128x4B = 2 MB in + 2 MB out).

Semantics identical to ops.pll.pll(wrap_phase=True, lag_correction=True)
— verified against it in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_tpu.ops.pll import PLL_CI, PLL_CP, PLLState, _wrap_modulus

LANES = 128


def _largest_divisor_at_most(n: int, cap: int) -> int:
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return n


def _atan2_poly(y, x):
    """atan2 via octant reduction + degree-9 minimax polynomial.

    Mosaic (Pallas TPU) has no native atan2 lowering; this is accurate to
    ~1e-5 rad — far below the PLL's loop noise.  atan2(0, 0) returns 0 like
    the libm convention the reference relies on.
    """
    abs_y = jnp.abs(y)
    abs_x = jnp.abs(x)
    swap = abs_y > abs_x
    num = jnp.where(swap, abs_x, abs_y)
    den = jnp.where(swap, abs_y, abs_x)
    z = num / jnp.maximum(den, 1e-30)
    a = z * z
    # minimax for atan(z), z in [0, 1]
    p = z * (0.99997726 + a * (-0.33262347 + a * (0.19354346 + a * (
        -0.11643287 + a * (0.05265332 + a * -0.01172120)))))
    r = jnp.where(swap, jnp.float32(np.pi / 2) - p, p)
    r = jnp.where(x < 0, jnp.float32(np.pi) - r, r)
    return jnp.where(y < 0, -r, r)


def _pll_kernel(x_ref, st_ref, out_ref, newst_ref, *, n_rows, kp, ki, w0,
                wmod, scale, adj, lag_correction):
    integ = st_ref[0:1, :]
    acc = st_ref[1:2, :]
    fbi = st_ref[2:3, :]
    fbq = st_ref[3:4, :]

    def body(i, carry):
        integ, acc, fbi, fbq = carry
        xi = x_ref[pl.ds(i, 1), :]
        error_d = _atan2_poly(xi * (-fbq), xi * fbi)
        integ = integ + ki * error_d
        acc = jnp.mod(acc + w0 + kp * error_d + integ, wmod)
        fbi = jnp.cos(acc)
        fbq = jnp.sin(acc)
        out_arg = acc - w0 if lag_correction else acc
        out_ref[pl.ds(i, 1), :] = jnp.cos(out_arg * scale + adj)
        return (integ, acc, fbi, fbq)

    integ, acc, fbi, fbq = jax.lax.fori_loop(0, n_rows, body,
                                             (integ, acc, fbi, fbq))
    newst_ref[0:1, :] = integ
    newst_ref[1:2, :] = acc
    newst_ref[2:3, :] = fbi
    newst_ref[3:4, :] = fbq


def _pll_chunked_kernel(x_ref, st_ref, out_ref, newst_ref, *, n_chunks,
                        chunk, kp, ki, w0, wmod, scale, adj, lag_correction):
    """Chunk-vectorized PLL recurrence in VMEM (the pll_chunked algorithm,
    ops/pll.py): per fori_loop step, freeze the feedback phase over `chunk`
    samples, measure all errors in one (chunk, 128) vector op, then apply
    the chunk's PI updates exactly via cumulative sums — computed as
    lower-triangular (chunk, chunk) matmuls on the MXU."""
    integ = st_ref[0:1, :]
    acc = st_ref[1:2, :]
    t = jax.lax.broadcasted_iota(jnp.int32, (chunk, LANES), 0
                                 ).astype(jnp.float32)            # 0..K-1
    j = t + 1.0                                                   # 1..K
    tri = (jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
           >= jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
           ).astype(jnp.float32)                                  # lower-tri

    def body(i, carry):
        integ, acc = carry
        xc = x_ref[pl.ds(i * chunk, chunk), :]
        pred = acc + t * (w0 + integ)
        e = _atan2_poly(xc * (-jnp.sin(pred)), xc * jnp.cos(pred))
        ce = jnp.dot(tri, e, preferred_element_type=jnp.float32)
        integ_i = integ + ki * ce
        cs_integ = j * integ + ki * jnp.dot(
            tri, ce, preferred_element_type=jnp.float32)
        acc_i = acc + j * w0 + kp * ce + cs_integ
        out_arg = acc_i - w0 if lag_correction else acc_i
        out_ref[pl.ds(i * chunk, chunk), :] = jnp.cos(out_arg * scale + adj)
        return (integ_i[chunk - 1:chunk, :],
                jnp.mod(acc_i[chunk - 1:chunk, :], wmod))

    integ, acc = jax.lax.fori_loop(0, n_chunks, body, (integ, acc))
    newst_ref[0:1, :] = integ
    newst_ref[1:2, :] = acc
    newst_ref[2:3, :] = jnp.cos(acc)
    newst_ref[3:4, :] = jnp.sin(acc)


@functools.partial(jax.jit, static_argnames=(
    "freq", "fs", "nco_scale", "phase_adjust", "norm_bandwidth",
    "lag_correction", "chunk", "interpret"))
def pll_pallas_chunked(x: jax.Array, state: PLLState, *, freq: float,
                       fs: float, nco_scale: float = 1.0,
                       phase_adjust: float = 0.0,
                       norm_bandwidth: float = 0.01,
                       lag_correction: bool = True, chunk: int = 32,
                       interpret: bool = False):
    """Drop-in for ops.pll.pll_chunked on TPU: same frozen-feedback math,
    run as one VMEM kernel (zero scan overhead between chunks).

    x: (N,) or (C, N) with C <= 128.  Returns (nco_out, new_state).
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
        state = jax.tree.map(lambda s: s[None], state)
    c, n = x.shape
    assert c <= LANES, f"channel batch {c} > {LANES}; shard first"
    # clamp to the VMEM tile bound first: chunk > 4096 would make
    # 4096 // chunk == 0 below and defeat the <=4096-row working set
    chunk = _largest_divisor_at_most(n, min(chunk, 4096))

    kp = float(norm_bandwidth * PLL_CP)
    ki = float(norm_bandwidth * norm_bandwidth * PLL_CI)
    w0 = float(2.0 * np.pi * (freq / fs))
    wmod = float(_wrap_modulus(nco_scale))

    xt = jnp.zeros((n, LANES), jnp.float32).at[:, :c].set(x.T)
    st = jnp.zeros((8, LANES), jnp.float32)
    st = st.at[0, :c].set(state.integrator)
    st = st.at[1, :c].set(state.phase_acc)
    st = st.at[2, :c].set(state.feedback_i)
    st = st.at[3, :c].set(state.feedback_q)

    # bound the VMEM working set: tile time into <=4096-row kernel calls
    # (2 MB in + 2 MB out), each running its chunks in one fori_loop
    rows = chunk * _largest_divisor_at_most(n // chunk, 4096 // chunk)
    kernel = functools.partial(
        _pll_chunked_kernel, n_chunks=rows // chunk, chunk=chunk, kp=kp,
        ki=ki, w0=w0, wmod=wmod, scale=float(nco_scale),
        adj=float(phase_adjust), lag_correction=lag_correction)
    call = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((8, LANES), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )

    def scan_fn(st, x_rows):
        out, new_st = call(x_rows, st)
        return new_st, out

    st_final, outs = jax.lax.scan(scan_fn, st,
                                  xt.reshape(n // rows, rows, LANES))
    nco = outs.reshape(n, LANES)[:, :c].T
    new_state = PLLState(
        integrator=st_final[0, :c], phase_acc=st_final[1, :c],
        feedback_i=st_final[2, :c], feedback_q=st_final[3, :c],
        trig_offset=state.trig_offset)
    if squeeze:
        nco = nco[0]
        new_state = jax.tree.map(lambda s: s[0], new_state)
    return nco, new_state


def _pll_chunked_kernel_multi(x_ref, st_ref, pm_ref, out_ref, newst_ref, *,
                              n_chunks, chunk, lanes, lag_correction):
    """The chunked PLL recurrence with PER-LANE loop parameters.

    Same math as _pll_chunked_kernel, but kp/ki/w0/wmod/scale/adj come from
    a (6, lanes) VMEM ref instead of baked scalars, so G independent PLL
    instances (e.g. the stereo 19 kHz pilot loop and the RDS 57 kHz carrier
    loop, different freq/scale/bandwidth) run in ONE kernel with their
    channel batches side by side on the lane axis.  The recurrence is
    latency-bound (a dependent chain of short row ops), so widening rows
    from 128 to G*128 lanes costs far less than G separate kernel launches
    — measured ~1.8x on the stereo+RDS chain's PLL stage.
    """
    integ = st_ref[0:1, :]
    acc = st_ref[1:2, :]
    kp = pm_ref[0:1, :]
    ki = pm_ref[1:2, :]
    w0 = pm_ref[2:3, :]
    wmod = pm_ref[3:4, :]
    scale = pm_ref[4:5, :]
    adj = pm_ref[5:6, :]
    t = jax.lax.broadcasted_iota(jnp.int32, (chunk, lanes), 0
                                 ).astype(jnp.float32)             # 0..K-1
    j = t + 1.0                                                    # 1..K
    tri = (jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
           >= jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
           ).astype(jnp.float32)                                   # lower-tri

    def body(i, carry):
        integ, acc = carry
        xc = x_ref[pl.ds(i * chunk, chunk), :]
        pred = acc + t * (w0 + integ)
        e = _atan2_poly(xc * (-jnp.sin(pred)), xc * jnp.cos(pred))
        ce = jnp.dot(tri, e, preferred_element_type=jnp.float32)
        integ_i = integ + ki * ce
        cs_integ = j * integ + ki * jnp.dot(
            tri, ce, preferred_element_type=jnp.float32)
        acc_i = acc + j * w0 + kp * ce + cs_integ
        out_arg = acc_i - w0 if lag_correction else acc_i
        out_ref[pl.ds(i * chunk, chunk), :] = jnp.cos(out_arg * scale + adj)
        return (integ_i[chunk - 1:chunk, :],
                jnp.mod(acc_i[chunk - 1:chunk, :], wmod))

    integ, acc = jax.lax.fori_loop(0, n_chunks, body, (integ, acc))
    newst_ref[0:1, :] = integ
    newst_ref[1:2, :] = acc
    newst_ref[2:3, :] = jnp.cos(acc)
    newst_ref[3:4, :] = jnp.sin(acc)


@functools.partial(jax.jit, static_argnames=(
    "params", "lag_correction", "chunk", "interpret"))
def pll_pallas_chunked_multi(xs, states, *, params, lag_correction=True,
                             chunk: int = 32, interpret: bool = False):
    """Run G independent chunked PLL instances in one kernel launch.

    xs: tuple of G arrays, each (N,) or (C_g, N) with C_g <= 128 and a
        common N.  states: tuple of G PLLStates.  params: tuple of G
        (freq, fs, nco_scale, phase_adjust, norm_bandwidth) tuples
        (hashable — this is a static argument).
    Returns (tuple of nco outputs, tuple of new states), each matching
    what pll_pallas_chunked would return for that instance alone.
    """
    assert len(xs) == len(states) == len(params)
    g = len(xs)
    squeezes = [x.ndim == 1 for x in xs]
    xs = [x[None, :] if s else x for x, s in zip(xs, squeezes)]
    states = [jax.tree.map(lambda v: v[None], st) if s else st
              for st, s in zip(states, squeezes)]
    n = xs[0].shape[-1]
    assert all(x.shape[-1] == n for x in xs)
    assert all(x.shape[0] <= LANES for x in xs)
    chunk = _largest_divisor_at_most(n, min(chunk, 4096))
    lanes = g * LANES

    xt = jnp.zeros((n, lanes), jnp.float32)
    st = jnp.zeros((8, lanes), jnp.float32)
    pm = np.zeros((8, lanes), np.float32)
    for i, (x, s, (freq, fs, nco_scale, phase_adjust, bw)) in enumerate(
            zip(xs, states, params)):
        c = x.shape[0]
        lo = i * LANES
        xt = xt.at[:, lo:lo + c].set(x.T)
        st = st.at[0, lo:lo + c].set(s.integrator)
        st = st.at[1, lo:lo + c].set(s.phase_acc)
        st = st.at[2, lo:lo + c].set(s.feedback_i)
        st = st.at[3, lo:lo + c].set(s.feedback_q)
        pm[0, lo:lo + LANES] = bw * PLL_CP
        pm[1, lo:lo + LANES] = bw * bw * PLL_CI
        pm[2, lo:lo + LANES] = 2.0 * np.pi * (freq / fs)
        pm[3, lo:lo + LANES] = _wrap_modulus(nco_scale)
        pm[4, lo:lo + LANES] = nco_scale
        pm[5, lo:lo + LANES] = phase_adjust
    pm = jnp.asarray(pm)

    rows = chunk * _largest_divisor_at_most(n // chunk, 4096 // chunk)
    kernel = functools.partial(
        _pll_chunked_kernel_multi, n_chunks=rows // chunk, chunk=chunk,
        lanes=lanes, lag_correction=lag_correction)
    call = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
                   jax.ShapeDtypeStruct((8, lanes), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )

    def scan_fn(st, x_rows):
        out, new_st = call(x_rows, st, pm)
        return new_st, out

    st_final, outs = jax.lax.scan(scan_fn, st,
                                  xt.reshape(n // rows, rows, lanes))
    outs = outs.reshape(n, lanes)
    ncos, new_states = [], []
    for i, (x, s, sq) in enumerate(zip(xs, states, squeezes)):
        c = x.shape[0]
        lo = i * LANES
        nco = outs[:, lo:lo + c].T
        ns = PLLState(
            integrator=st_final[0, lo:lo + c],
            phase_acc=st_final[1, lo:lo + c],
            feedback_i=st_final[2, lo:lo + c],
            feedback_q=st_final[3, lo:lo + c],
            trig_offset=s.trig_offset)
        if sq:
            nco = nco[0]
            ns = jax.tree.map(lambda v: v[0], ns)
        ncos.append(nco)
        new_states.append(ns)
    return tuple(ncos), tuple(new_states)


@functools.partial(jax.jit, static_argnames=(
    "freq", "fs", "nco_scale", "phase_adjust", "norm_bandwidth",
    "lag_correction", "chunk", "interpret"))
def pll_pallas(x: jax.Array, state: PLLState, *, freq: float, fs: float,
               nco_scale: float = 1.0, phase_adjust: float = 0.0,
               norm_bandwidth: float = 0.01, lag_correction: bool = True,
               chunk: int = 4096, interpret: bool = False):
    """Drop-in for ops.pll.pll(wrap_phase=True) on TPU.

    x: (N,) or (C, N) with C <= 128.  Returns (nco_out, new_state).
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
        state = jax.tree.map(lambda s: s[None], state)
    c, n = x.shape
    assert c <= LANES, f"channel batch {c} > {LANES}; shard first"

    kp = float(norm_bandwidth * PLL_CP)
    ki = float(norm_bandwidth * norm_bandwidth * PLL_CI)
    w0 = float(2.0 * np.pi * (freq / fs))
    wmod = float(_wrap_modulus(nco_scale))

    # time-major, lane-padded
    xt = jnp.zeros((n, LANES), jnp.float32).at[:, :c].set(x.T)
    st = jnp.zeros((8, LANES), jnp.float32)
    st = st.at[0, :c].set(state.integrator)
    st = st.at[1, :c].set(state.phase_acc)
    st = st.at[2, :c].set(state.feedback_i)
    st = st.at[3, :c].set(state.feedback_q)

    # chunk must divide n exactly: padded time rows would advance the NCO
    # phase through nonexistent samples and break streaming continuity.
    # Receiver block lengths are highly composite, so a divisor <= chunk
    # is always close to the target.
    chunk = _largest_divisor_at_most(n, chunk)
    xc = xt.reshape(n // chunk, chunk, LANES)

    kernel = functools.partial(
        _pll_kernel, n_rows=chunk, kp=kp, ki=ki, w0=w0, wmod=wmod,
        scale=float(nco_scale), adj=float(phase_adjust),
        lag_correction=lag_correction)

    call = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((chunk, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((8, LANES), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )

    def scan_fn(st, x_chunk):
        out, new_st = call(x_chunk, st)
        return new_st, out

    st_final, outs = jax.lax.scan(scan_fn, st, xc)
    nco = outs.reshape(n, LANES)[:, :c].T
    new_state = PLLState(
        integrator=st_final[0, :c], phase_acc=st_final[1, :c],
        feedback_i=st_final[2, :c], feedback_q=st_final[3, :c],
        trig_offset=state.trig_offset)
    if squeeze:
        nco = nco[0]
        new_state = jax.tree.map(lambda s: s[0], new_state)
    return nco, new_state

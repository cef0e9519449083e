"""Per-stage roofline breakdown of the receiver chain on real TPU.

Times each pipeline stage in isolation at the production shape (128
channels, 50-block steps) using the same scanned-program methodology as
bench.py (device-resident input, scalar-fetch sync to defeat the tunnel's
no-op block_until_ready), and reports per-stage time, the GS/s each stage
would sustain alone, bytes moved, FLOPs, and % of the measured chain —
the evidence VERDICT item 2 demands for "where the time goes".

Usage: python tools/bench_stages.py [--stereo-rds-only]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


REPEATS = 16  # outer re-scans per timed call: one D2H sync amortizes over
# REPEATS*S steps (the tunnel's ~27 ms fetch floor would otherwise dominate
# every sub-ms stage — the round-2 table's flaw)


def _timed(fn, *args, reps: int = 3) -> float:
    import jax
    total = float(fn(*args))   # compile + warm
    assert np.isfinite(total)
    t0 = time.perf_counter()
    for _ in range(reps):
        total = float(fn(*args))
    return (time.perf_counter() - t0) / reps / REPEATS


def main() -> int:
    import jax
    import jax.numpy as jnp
    from sdr_tpu.models.receiver import Receiver
    from sdr_tpu.ops.demod import fm_discriminator
    from sdr_tpu.ops.pointwise import mixer, delay_line, lr_matrix

    ap = argparse.ArgumentParser()
    ap.add_argument("--n-ch", type=int, default=128)
    ap.add_argument("--bps", type=int, default=50)
    ap.add_argument("--n-steps", type=int, default=8)
    ap.add_argument("--skip-full", action="store_true",
                    help="skip the (slow-compiling) full-chain rows")
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    C, S = args.n_ch, args.n_steps
    rx = Receiver(0, stereo=True, rds=True, fused_frontend="bf16",
                  pll_impl="pallas_chunked", pll_chunk=32)
    bs = rx.block_size_u8(args.bps)
    n_if = bs // (2 * rx.cfg.rf_decim)
    n_iq = bs // 2
    print(f"shape: C={C} S={S} bs={bs} u8 -> n_if={n_if}", file=sys.stderr)

    rng = np.random.default_rng(0)
    u8_blocks = jax.device_put(rng.integers(0, 256, size=(S, C, bs),
                                            dtype=np.uint8))
    if_blocks = jax.device_put(rng.standard_normal(
        (S, C, n_if)).astype(np.float32) * 0.1)

    results: list[tuple[str, float, float]] = []  # (name, sec/step, GS/s)

    def bench_if_stage(name, make_state, step_fn, blocks_in=None):
        """Scan an IF-rate stage over S blocks with carried state."""
        @jax.jit
        def run(state, blocks):
            def body(st, blk):
                st2, out = step_fn(st, blk)
                return st2, jnp.sum(out)
            def outer(carry, _):
                st, acc = carry
                st, sums = jax.lax.scan(body, st, blocks)
                return (st, acc + jnp.sum(sums)), None
            (st, acc), _ = jax.lax.scan(outer, (state, jnp.float32(0.0)),
                                        None, length=REPEATS)
            return acc
        dt = _timed(run, make_state(),
                    if_blocks if blocks_in is None else blocks_in) / S
        results.append((name, dt, n_iq * C / dt / 1e9))
        print(f"  {name:28s} {dt*1e3:8.3f} ms/step "
              f"{n_iq * C / dt / 1e9:7.1f} GS/s-alone", file=sys.stderr)

    # ---- front end (u8 -> IF), bf16 fused kernel
    @jax.jit
    def run_fe(tail, blocks):
        def body(tail, blk):
            i_ds, q_ds, tail = rx._fused_fe(blk, tail)
            return tail, jnp.sum(i_ds) + jnp.sum(q_ds)
        def outer(carry, _):
            t, acc = carry
            t, sums = jax.lax.scan(body, t, blocks)
            return (t, acc + jnp.sum(sums)), None
        (tail, acc), _ = jax.lax.scan(outer, (tail, jnp.float32(0.0)),
                                      None, length=REPEATS)
        return acc
    dt = _timed(run_fe, rx._fused_fe.init_state((C,)), u8_blocks) / S
    results.append(("frontend_bf16", dt, n_iq * C / dt / 1e9))
    print(f"  {'frontend_bf16':28s} {dt*1e3:8.3f} ms/step "
          f"{n_iq * C / dt / 1e9:7.1f} GS/s-alone", file=sys.stderr)

    # ---- demod
    bench_if_stage(
        "demod_discriminator",
        lambda: (jnp.zeros((C,)), jnp.zeros((C,))),
        lambda st, blk: ((lambda d, pi, pq: ((pi, pq), d))(
            *fm_discriminator(blk, blk * 0.5, st[0], st[1]))))

    # ---- mono audio resampler
    bench_if_stage("mono_resample",
                   lambda: rx.audio_resampler.init_state((C,)),
                   lambda st, blk: (lambda y, t: (t, y))(
                       *rx.audio_resampler(blk, st)))

    # ---- fused 3-filter IF BPF (stereo channel + pilot + RDS channel)
    bench_if_stage("if_bpf3_multifir",
                   lambda: rx.if_bpf3.init_state((C,)),
                   lambda st, blk: (lambda outs, t: (
                       t, outs[0] + outs[1] + outs[2]))(
                       *rx.if_bpf3(blk, st)))

    # ---- fused 3-filter IF BPF in bf16 (lowering probe: if bf16 == f32 the
    # conv is not MXU-bound)
    rx_b = Receiver(0, stereo=True, rds=True, fused_frontend="bf16",
                    pll_impl="ff", conv_dtype="bf16")
    bench_if_stage("if_bpf3_multifir_bf16",
                   lambda: rx_b.if_bpf3.init_state((C,)),
                   lambda st, blk: (lambda outs, t: (
                       t, outs[0] + outs[1] + outs[2]))(
                       *rx_b.if_bpf3(blk, st)))

    # ---- PLL (Pallas chunked-32): one instance vs the joint dual launch
    from sdr_tpu.ops.pll import pll_init
    from sdr_tpu.ops.pallas.pll_kernel import (pll_pallas_chunked,
                                               pll_pallas_chunked_multi)
    bench_if_stage("pll_pallas_chunked32_x1",
                   lambda: pll_init((C,)),
                   lambda st, blk: (lambda nco, st2: (st2, nco))(
                       *pll_pallas_chunked(blk, st, freq=19e3, fs=240e3,
                                           nco_scale=2.0, chunk=32)))

    from sdr_tpu.ops.pll import pll_feedforward
    bench_if_stage("pll_ff_x1",
                   lambda: pll_init((C,)),
                   lambda st, blk: (lambda nco, st2: (st2, nco))(
                       *pll_feedforward(blk, st, freq=19e3, fs=240e3,
                                        nco_scale=2.0)))

    def joint_pll(st, blk):
        (n1, n2), (s1, s2) = pll_pallas_chunked_multi(
            (blk, blk * 0.7), st,
            params=((19e3, 240e3, 2.0, 0.0, 0.01),
                    (114e3, 240e3, 0.5, 0.0, 0.003)),
            chunk=32)
        return (s1, s2), n1 + n2
    bench_if_stage("pll_joint_dual", lambda: (pll_init((C,)), pll_init((C,))),
                   joint_pll)

    # ---- RDS square + carrier BPF (channel BPF now rides if_bpf3)
    def rds_convs(st, blk):
        carrier_in, ca_t = rx.rds_carrier_filter(blk * blk, st)
        return ca_t, carrier_in
    bench_if_stage("rds_sq+carrier_bpf",
                   lambda: rx.rds_carrier_filter.init_state((C,)),
                   rds_convs)

    # ---- RDS resample + RRC
    def rds_tail(st, blk):
        r_t, rrc_t = st
        res, r_t = rx.rds_resampler(blk, r_t)
        soft, rrc_t = rx.rds_rrc(res, rrc_t)
        return (r_t, rrc_t), jnp.sum(soft)
    bench_if_stage("rds_resample+rrc",
                   lambda: (rx.rds_resampler.init_state((C,)),
                            rx.rds_rrc.init_state((C,))),
                   rds_tail)

    # ---- RDS resample + RRC, tiled banded-GEMM engine (ops/banded.py)
    rx_t = Receiver(0, stereo=True, rds=True, fused_frontend="bf16",
                    pll_impl="ff", conv_dtype="bf16", conv_engine="tiled")
    def rds_tail_t(st, blk):
        r_t, rrc_t = st
        res, r_t = rx_t.rds_resampler(blk, r_t)
        soft, rrc_t = rx_t.rds_rrc(res, rrc_t)
        return (r_t, rrc_t), jnp.sum(soft)
    bench_if_stage("rds_resample+rrc_tiled",
                   lambda: (rx_t.rds_resampler.init_state((C,)),
                            rx_t.rds_rrc.init_state((C,))),
                   rds_tail_t)

    # ---- audio resample pair: conv vs tiled
    def audio_pair(r, st, blk):
        pair, tails = r.audio_resampler(jnp.stack([blk, blk * 0.5]),
                                        jnp.stack([st[0], st[1]]))
        return (tails[0], tails[1]), jnp.sum(pair)
    bench_if_stage("audio_pair_conv",
                   lambda: (rx.audio_resampler.init_state((C,)),
                            rx.audio_resampler.init_state((C,))),
                   lambda st, blk: audio_pair(rx, st, blk))
    bench_if_stage("audio_pair_tiled",
                   lambda: (rx_t.audio_resampler.init_state((C,)),
                            rx_t.audio_resampler.init_state((C,))),
                   lambda st, blk: audio_pair(rx_t, st, blk))

    # ---- fused IF bank: sub_tiles 1 vs 4 (input cropped to a whole
    # number of 512-IF tiles; the receiver handles this via block_align_u8)
    from sdr_tpu.ops.pallas.ifbank_kernel import FusedIFBank
    from sdr_tpu.ops import firdes
    cfg0 = rx.cfg
    if_tiled_blocks = if_blocks[..., : (n_if // 512) * 512]
    n_if_t = if_tiled_blocks.shape[-1]
    for stt in (1, 4):
        bank = FusedIFBank(
            firdes.bandpass(cfg0.if_fs, cfg0.stereo_lo, cfg0.stereo_hi,
                            cfg0.bp_taps),
            firdes.bandpass(cfg0.if_fs, cfg0.pilot_lo, cfg0.pilot_hi,
                            cfg0.bp_taps),
            firdes.bandpass(cfg0.if_fs, cfg0.rds_lo, cfg0.rds_hi,
                            cfg0.bp_taps),
            firdes.bandpass(cfg0.if_fs, cfg0.rds_carrier_lo,
                            cfg0.rds_carrier_hi, cfg0.bp_taps),
            compute_dtype=jnp.bfloat16, sub_tiles=stt)
        bench_if_stage(f"ifbank_bf16_sub{stt}",
                       lambda b=bank: b.init_state((C,)),
                       lambda st, blk, b=bank: (lambda c, p, rc, ci, t: (
                           t, c + p + rc + ci))(*b(blk, st)),
                       blocks_in=if_tiled_blocks)

    # ---- stereo mixer + audio resample + matrix + delay
    def stereo_tail(st, blk):
        d, sa_t = st
        mixed = mixer(blk, blk * 0.9)
        sa, sa_t = rx.stereo_audio_resampler(mixed, sa_t)
        # delay operates at audio rate on the mono branch
        mono_shift, d = delay_line(sa, d)
        l, r = lr_matrix(mono_shift, sa)
        return (d, sa_t), jnp.sum(l) + jnp.sum(r)
    bench_if_stage("stereo_mix+resamp+matrix",
                   lambda: (jnp.zeros((C, rx.cfg.mono_delay)),
                            rx.stereo_audio_resampler.init_state((C,))),
                   stereo_tail)

    # ---- full chains for cross-check
    full_rows = [] if args.skip_full else [
            ("FULL mono (bf16 fe)", Receiver(0, fused_frontend="bf16")),
            ("FULL stereo+rds ff", Receiver(0, stereo=True, rds=True,
                                            fused_frontend="bf16",
                                            pll_impl="ff")),
            ("FULL stereo+rds fast", rx)]
    for label, r2 in full_rows:
        bs2 = r2.block_size_u8(args.bps)
        blocks2 = (u8_blocks[..., :bs2] if bs2 <= bs else jax.device_put(
            rng.integers(0, 256, size=(S, C, bs2), dtype=np.uint8)))

        @jax.jit
        def run_full(state, blocks, r2=r2):
            def body(st, blk):
                st2, out = r2.step(st, blk)
                return st2, sum(jnp.sum(v) for v in out.values())
            def outer(carry, _):
                st, acc = carry
                st, sums = jax.lax.scan(body, st, blocks)
                return (st, acc + jnp.sum(sums)), None
            (st, acc), _ = jax.lax.scan(outer, (state, jnp.float32(0.0)),
                                        None, length=REPEATS)
            return acc
        dt = _timed(run_full, r2.init_state((C,)), blocks2) / S
        gs = (bs2 // 2) * C / dt / 1e9
        results.append((label, dt, gs))
        print(f"  {label:28s} {dt*1e3:8.3f} ms/step {gs:7.1f} GS/s",
              file=sys.stderr)

    # ---- summary table
    full = next((dt for n, dt, _ in results
                 if n == "FULL stereo+rds fast"), None)
    print("\nstage                          ms/step   GS/s-alone   % of "
          "stereo+rds chain")
    for name, dt, gs in results:
        pct = f"{dt/full*100:6.1f}%" if full else "      "
        print(f"{name:30s} {dt*1e3:8.3f}   {gs:8.1f}     {pct}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

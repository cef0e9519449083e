"""Throughput benchmark: FM receiver chain IQ Msamples/s per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's implicit performance contract is sustaining
real-time ingest of 2.4 MS/s IQ on a Raspberry Pi 4 (BASELINE.md) — so
vs_baseline = (IQ MS/s per chip) / 2.4, i.e. how many simultaneous
real-time mode-0 stations one chip sustains.

Methodology: the steady-state production shape — `lax.scan` over S blocks
in ONE device program (exactly what Receiver.run does), synchronized by a
scalar reduction fetched to host (this tunnel-attached backend's
block_until_ready does not actually wait, and per-dispatch sync costs
~27 ms of tunnel latency — scanning amortizes it to noise).  Input lives
on device: this measures the compute path, the honest per-chip capability;
host->device feeding on this relay-tunneled dev box runs ~18 MB/s and is
reported separately to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _bench_scan(rx, n_ch: int, bps: int, n_steps: int, reps: int = 3,
                repeats: int = 16, spread: bool = False):
    """Sustained aggregate IQ Msamples/s over a scanned multi-block program.

    `repeats` re-scans the same device-resident blocks with the carried
    state flowing through (an outer scan — no CSE possible, every pass
    computes different outputs), so one D2H sync amortizes over
    repeats*n_steps steps.  Round-1 methodology used repeats=1 and was
    dominated by the ~27 ms tunnel round-trip of the sync fetch itself
    (measured in tools/bench_stages.py: the full mono step computes in
    ~0.45 ms but the per-fetch latency floor is ~27/n_steps ms); a
    production host syncs over local PCIe at ~us latency, so the amortized
    number is the honest per-chip capability."""
    import jax
    import jax.numpy as jnp

    bs = rx.block_size_u8(bps)
    rng = np.random.default_rng(0)
    # ONE device-resident block fed to every step (the carried state still
    # evolves, so no CSE).  Scanning over an (n_steps, ...) stack made XLA
    # materialize a dynamic-slice COPY of the raw bytes every step — 12%
    # of the stereo step in the round-4 profile — an artifact of the bench
    # packing, not of the receiver: live deployments feed each block
    # directly (fresh H2D buffer), and offline Receiver.run reads each
    # block slice exactly once.
    block = jax.device_put(rng.integers(
        0, 256, size=(n_ch, bs), dtype=np.uint8))
    state0 = rx.init_state((n_ch,))

    @jax.jit
    def run_all(state, block):
        def body(st, _):
            st2, out = rx.step(st, block)
            # keep every output's producing op live with one element each
            # (XLA only DCEs whole ops, never partial elements) — the
            # round-4 full jnp.sum of all outputs cost ~4.5 ms/step on the
            # stereo chain, swamping the thing being measured
            return st2, sum(v.reshape(-1)[0].astype(jnp.float32)
                            for v in out.values())

        def outer(carry, _):
            st, acc = carry
            st, sums = jax.lax.scan(body, st, None, length=n_steps)
            return (st, acc + jnp.sum(sums)), None

        (st, acc), _ = jax.lax.scan(outer, (state, jnp.float32(0.0)),
                                    None, length=repeats)
        return acc

    total = float(run_all(state0, block))  # warm/compile + sync
    dts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        total = float(run_all(state0, block))
        dts.append(time.perf_counter() - t0)
    assert np.isfinite(total)
    work = n_ch * (bs // 2) * n_steps * repeats / 1e6
    vals = sorted(work / dt for dt in dts)
    med = vals[len(vals) // 2]
    if spread:
        return med, (vals[0], vals[-1])
    return med


def _bench_h2d(n_bytes: int = 8 << 20, reps: int = 3) -> float:
    import jax
    buf = np.random.default_rng(0).integers(0, 256, size=n_bytes,
                                            dtype=np.uint8)
    jax.device_put(buf).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.device_put(buf).block_until_ready()
    return n_bytes / ((time.perf_counter() - t0) / reps) / 1e6


def main() -> int:
    import jax
    from sdr_tpu.models.receiver import Receiver

    t_start = time.perf_counter()
    budget_s = float(__import__("os").environ.get("BENCH_BUDGET_S", "480"))
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    # headline: mono chain, 128 simultaneous stations, fused bf16 Pallas
    # front-end (exact u8 decode; ~53 dB channelizer SNR from coefficient
    # rounding — transparent at FM demod's ~25 dB distortion floor).
    # fe_out_tile=1024/sub_tiles=16: same sub-matmul shapes as the
    # low-latency default (128/2) but 8x fewer grid steps — the
    # throughput configuration (grid-iteration overhead dominated the fe
    # at fine tiles; fine tiles remain the default because the
    # low-latency bps=1 block is only 640 IF samples).
    # 128ch/50-block steps is the measured utilization sweet spot on v5e.
    # Median of 5 timed reps with min..max spread (VERDICT r2 weak item 1:
    # the quoted headline must carry its variance).
    msps, (lo, hi) = _bench_scan(Receiver(0, fused_frontend="int8",
                                          fe_out_tile=1024, fe_sub_tiles=8,
                                          conv_engine="tiled",
                                          conv_dtype="bf16"),
                                 128, 50, 10, reps=5, spread=True)
    print(f"mono  128ch fused-int8+tiled-bf16: {msps:8.1f} IQ MS/s/chip "
          f"(median of 5; spread {lo:.0f}..{hi:.0f})", file=sys.stderr)

    # emit the headline immediately: tunnel-side compiles of the optional
    # extras below can take minutes each when the remote cache is cold
    print(json.dumps({
        "metric": "mono_fm_iq_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / 2.4, 1),
    }), flush=True)

    def time_left() -> bool:
        return time.perf_counter() - t_start < budget_s

    if time_left():
        # the exact-integer engine: bit-exact reproducible under any
        # tiling (int8x2 limbs, int32 accumulation) at int8-MXU rate —
        # replaces the 8.8 GS/s exact-f32 conv path as the exactness story
        msps_int = _bench_scan(Receiver(0, fused_frontend="int8x2",
                                        fe_out_tile=1024, fe_sub_tiles=8),
                               128, 50, 10)
        print(f"mono  128ch exact-int8x2: {msps_int:6.1f} IQ MS/s/chip "
              f"(bit-exact engine)", file=sys.stderr)
    if time_left():
        msps_f32 = _bench_scan(Receiver(0), 128, 50, 10)
        print(f"mono  128ch exact f32: {msps_f32:9.1f} IQ MS/s/chip",
              file=sys.stderr)
    if time_left():
        msps_stc = _bench_scan(Receiver(0, stereo=True, rds=True,
                                        fused_frontend="int8",
                                        fe_out_tile=1024, fe_sub_tiles=8,
                                        pll_impl="ff",
                                        conv_dtype="bf16",
                                        fused_ifbank="bf16",
                                        conv_engine="tiled"),
                               128, 50, 8)
        print(f"stereo+RDS 128ch (fused int8 front end + fused IF-bank "
              f"+ fused carrier-synth/mix + Pallas audio pair + bf16 "
              f"materialization): {msps_stc:5.1f} IQ MS/s/chip",
              file=sys.stderr)
    if time_left():
        # wideband channelizer, Pallas pipelined engine (round 5): one
        # 9.6 MS/s antenna -> 64 stations, u8 pre-phased ingest
        import jax.numpy as jnp
        from sdr_tpu.ops.channelizer import WidebandChannelizer
        k = 64
        chan = WidebandChannelizer(
            9.6e6, 2.4e6, list(np.linspace(-4.0e6, 4.0e6, k)),
            engine="pallas", ingest="u8")
        n_wide = 1 << 20
        rng = np.random.default_rng(0)
        xbt = jax.device_put(rng.integers(
            0, 256, size=(2 * chan.decim, n_wide // chan.decim),
            dtype=np.uint8))
        cst = chan.init_state()

        @jax.jit
        def chan_all(state, xbt):
            def body(carry, _):
                st, acc = carry
                (i_o, q_o), st2 = chan._pl.call_cols(xbt, st)
                return (st2, acc + i_o[0, 0] + q_o[0, 0]), None
            (st, acc), _ = jax.lax.scan(body, (state, jnp.float32(0.0)),
                                        None, length=512)
            return acc

        float(chan_all(cst, xbt))
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chan_all(cst, xbt))
            dts.append(time.perf_counter() - t0)
        wms = n_wide * 512 / sorted(dts)[1] / 1e6
        print(f"wideband channelizer 64st pallas-u8 (pre-phased): "
              f"{wms:7.1f} wideband MS/s/chip", file=sys.stderr)
    if time_left():
        h2d = _bench_h2d()
        print(f"H2D bandwidth (dev-box tunnel): {h2d:.1f} MB/s",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

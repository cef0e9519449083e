"""Scaling proxy on the virtual CPU mesh (1 -> 2 -> 4 -> 8 devices).

Real multi-chip hardware is not available in this environment (one TPU chip
behind a tunnel), so this tool records the two kinds of scaling evidence a
virtual CPU mesh CAN produce for BASELINE.md:

  1. Weak-scaling wall clock: C channels/device at 1/2/4/8 devices.  NOTE
     this host has 2 physical cores, so 4- and 8-device times oversubscribe
     the cores and understate a real pod's efficiency; the 1 -> 2 step is
     the only core-backed data point.
  2. Compiled-program analysis (core-count independent): the per-device HLO
     of the channel-DP program at each mesh size, grepping for collectives.
     Channel DP is embarrassingly parallel — ZERO collective ops means the
     per-device program is identical to the single-device one and scaling
     on real hardware is bounded only by input feeding, not ICI/DCN.

Run: python tools/bench_scaling.py  (re-execs itself with a clean CPU env).
"""

import json
import os
import sys
import time

if os.environ.get("_SDR_SCALING_CHILD") != "1":
    env = {k: v for k, v in os.environ.items() if "AXON" not in k}
    env["_SDR_SCALING_CHILD"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                        + env.get("XLA_FLAGS", ""))
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from sdr_tpu.config import MODES
from sdr_tpu.models.receiver import Receiver
from sdr_tpu.parallel.channels import sharded_run
from sdr_tpu.parallel.mesh import make_mesh
from sdr_tpu import tx

COLLECTIVES = ("all-reduce", "all-gather", "all-to-all", "collective-permute",
               "reduce-scatter")


def hlo_collective_count(rx, n_dev: int, n_ch: int, n_bytes: int) -> int:
    """Compile the sharded program and count collective ops in its HLO."""
    from functools import partial
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    mesh = make_mesh(n_dev, "channels")
    bs = rx.block_size_u8()

    @partial(shard_map, mesh=mesh, in_specs=(P("channels"), P("channels")),
             out_specs=P("channels"), check_vma=False)
    def run_shard(iq_local, state_mono_tail):
        del state_mono_tail
        state = rx.init_state((iq_local.shape[0],))
        nblocks = iq_local.shape[-1] // bs
        blocks = iq_local[..., : nblocks * bs].reshape(
            iq_local.shape[0], nblocks, bs)
        blocks = jax.numpy.moveaxis(blocks, 1, 0)
        _, outs = jax.lax.scan(lambda st, blk: rx.step(st, blk), state, blocks)
        return jax.numpy.moveaxis(outs["mono"], 0, 1).reshape(
            iq_local.shape[0], -1)

    dummy_state = jax.numpy.zeros((n_ch, 1))
    lowered = jax.jit(run_shard).lower(
        jax.ShapeDtypeStruct((n_ch, n_bytes), jax.numpy.uint8), dummy_state)
    hlo = lowered.compile().as_text()
    return sum(hlo.count(c) for c in COLLECTIVES)


FAST = dict(fused_frontend="bf16", pll_impl="ff", conv_dtype="bf16",
            conv_engine="tiled", fused_ifbank="bf16")


def main():
    cfg = MODES[0]
    # round-5 refresh (VERDICT r4 item 6): the weak-scaling evidence is
    # measured with the PRODUCTION engine set the headline numbers use
    # (fused bf16 front end + feedforward carriers + fused IF bank + tiled
    # banded convs), full stereo+RDS chain — not the round-1 engines
    rx = Receiver(0, stereo=True, rds=True, **FAST)
    per_dev = 2           # channels per device (weak scaling)
    sec = 0.05
    n = int(sec * cfg.rf_fs)

    rows = []
    for n_dev in (1, 2, 4, 8):
        n_ch = per_dev * n_dev
        caps = np.stack([
            tx.synthesize_capture(cfg, seconds=sec,
                                  left=tx.tone(cfg.rf_fs, 500.0 + 40.0 * c, n),
                                  right=tx.tone(cfg.rf_fs, 700.0 + 40.0 * c,
                                                n),
                                  seed=c)
            for c in range(n_ch)])
        mesh = make_mesh(n_dev, "channels")
        # warmup (compile)
        outs, _ = sharded_run(rx, caps, mesh)
        jax.block_until_ready(outs["mono"])
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            outs, _ = sharded_run(rx, caps, mesh)
            jax.block_until_ready(outs["mono"])
        dt = (time.perf_counter() - t0) / reps
        ncoll = hlo_collective_count(rx, n_dev, n_ch, caps.shape[-1])
        rows.append({"devices": n_dev, "channels": n_ch,
                     "wall_s": round(dt, 4),
                     "iq_ms_per_s": round(n_ch * n / dt / 1e6, 1),
                     "hlo_collectives": ncoll})
        print(json.dumps(rows[-1]))

    t1 = rows[0]["wall_s"]
    for r in rows:
        r["weak_eff_pct"] = round(100.0 * t1 / r["wall_s"], 1)
    print(json.dumps({"table": rows, "physical_cores": os.cpu_count()}))

    # ---- strong scaling of ONE stereo station over the time axis
    # (PLL warm-up halo sharding, parallel/timeshard.py).  Only the
    # 1 -> 2 step is core-backed on this 2-core host.
    from sdr_tpu.parallel.timeshard import timesharded_stereo
    rx_st = Receiver(0, stereo=True)
    align = 8 * 2 * cfg.rf_decim * cfg.audio_decim
    n_st = ((int(1.6 * cfg.rf_fs) * 2) // align) * align
    capst = tx.synthesize_capture(
        cfg, seconds=n_st / 2 / cfg.rf_fs,
        left=tx.tone(cfg.rf_fs, 1000.0, n_st // 2),
        right=tx.tone(cfg.rf_fs, 2500.0, n_st // 2))[:n_st]

    st_rows = []
    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_dev, "time")
        if n_dev == 1:
            def run():
                outs, _ = rx_st.run(capst)
                jax.block_until_ready(outs["left"])
        else:
            def run(mesh=mesh):
                l, r = timesharded_stereo(rx_st, capst, mesh)
                jax.block_until_ready((l, r))
        run()  # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            run()
        dt = (time.perf_counter() - t0) / reps
        st_rows.append({"devices": n_dev, "wall_s": round(dt, 4),
                        "speedup": round(st_rows[0]["wall_s"] / dt, 2)
                        if st_rows else 1.0})
        print(json.dumps({"stereo_timeshard": st_rows[-1]}))
    print(json.dumps({"stereo_timeshard_table": st_rows}))


if __name__ == "__main__":
    main()

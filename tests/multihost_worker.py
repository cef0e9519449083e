"""Worker process for the multi-host (DCN) execution test.

Spawned by tests/test_multihost.py as N OS processes, each owning 4 virtual
CPU devices (XLA_FLAGS set by the parent before the interpreter starts).
This is the real `jax.distributed` path of SURVEY §5.8 / §2.3: coordinator
bring-up, global mesh over all hosts' devices, per-host input feeding via
`make_global_batch`, one SPMD `sharded_run`, and a per-host check of its
addressable output shards against a local serial run.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import sys


def main() -> int:
    proc_id, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax
    import numpy as np

    from sdr_tpu.parallel import distributed as dist

    dist.initialize(coordinator_address=f"127.0.0.1:{port}",
                    num_processes=n_proc, process_id=proc_id)
    assert jax.process_count() == n_proc, jax.process_count()

    from sdr_tpu.config import MODES
    from sdr_tpu.models.receiver import Receiver
    from sdr_tpu.parallel.channels import sharded_run
    from sdr_tpu import tx

    cfg = MODES[0]
    n_ch = 8
    sec = 0.02
    n = int(sec * cfg.rf_fs)

    # per-host feeding: this host synthesizes ONLY its own channel slice
    # (the multi-host analogue of each host reading its own capture files)
    lo, hi = dist.local_channel_slice(n_ch)
    local = np.stack([
        tx.synthesize_capture(cfg, seconds=sec,
                              mono=tx.tone(cfg.rf_fs, 400.0 + 250.0 * c, n),
                              seed=c)
        for c in range(lo, hi)])

    mesh = dist.global_channel_mesh()
    giq = dist.make_global_batch(local, mesh)
    assert not giq.is_fully_addressable  # truly spans processes

    rx = Receiver(0)
    outs, _ = sharded_run(rx, giq, mesh)
    mono = outs["mono"]

    # this host's shards of the global output == a local serial run of the
    # channels it fed
    serial, _ = rx.run(local)
    want = np.asarray(serial["mono"])
    shards = sorted(mono.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    got = np.concatenate([np.asarray(s.data) for s in shards])
    start = min(s.index[0].start or 0 for s in shards)
    assert start == lo, (start, lo)
    np.testing.assert_allclose(got, want, atol=1e-6)

    print(f"MULTIHOST_OK proc={proc_id}/{jax.process_count()} "
          f"global_devices={jax.device_count()} "
          f"local_devices={jax.local_device_count()}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

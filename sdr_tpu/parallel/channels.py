"""Channel data-parallelism: shard independent FM stations over the mesh.

Every op in sdr_tpu is batch-polymorphic over leading dims, so channel DP is
pure SPMD: place the (channels, ...) batch with a NamedSharding and jit —
XLA runs each shard's scan locally with zero collectives (the channels are
independent; BASELINE config 5's '64+ channels over N>=2 hosts').

`shard_receiver_run` is the explicit shard_map variant: it guarantees the
per-device program contains no cross-device communication, and is the form
that extends to multi-host meshes where each host feeds its own shard.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from sdr_tpu.models.receiver import Receiver


def sharded_run(rx: Receiver, iq_u8, mesh: Mesh, *, axis: str = "channels",
                blocks_per_step: int = 1):
    """Run the receiver over (channels, n) u8 with channels sharded on mesh.

    Returns outputs with the same sharding (host gets them lazily).
    """
    n_ch = iq_u8.shape[0]
    n_dev = mesh.shape[axis]
    sharding = NamedSharding(mesh, P(axis))
    if isinstance(iq_u8, jax.Array) and not iq_u8.is_fully_addressable:
        # multi-host: the caller assembled the global batch with
        # distributed.make_global_batch (per-host feeding); the state must
        # be *computed* into the global sharding (device_put of host-local
        # arrays cannot span processes)
        n_pad = 0
        assert n_ch % n_dev == 0, (
            f"global batch of {n_ch} channels not divisible by {n_dev}")
        iq = iq_u8
        state = jax.jit(lambda: rx.init_state((n_ch,)),
                        out_shardings=sharding)()
    else:
        # ragged channel counts: pad with silent (all-128 = zero-signal)
        # channels to the next device multiple, slice padding back off below
        n_pad = (-n_ch) % n_dev
        iq_np = np.asarray(iq_u8)
        if n_pad:
            iq_np = np.concatenate(
                [iq_np, np.full((n_pad,) + iq_np.shape[1:], 128, iq_np.dtype)])
        iq = jax.device_put(iq_np, sharding)
        state = rx.init_state((n_ch + n_pad,))
        state = jax.device_put(state, sharding)

    bs = rx.block_size_u8(blocks_per_step)
    n_in = iq.shape[-1]
    nblocks = n_in // bs
    # flush the trailing remainder at the finest aligned block size, like
    # Receiver.run (split-invariance makes the outputs identical) — without
    # this, coarse-aligned engine sets silently drop up to bs-1 bytes
    align = rx.block_align_u8()
    tail_bs = ((n_in - nblocks * bs) // align) * align

    @partial(shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
             out_specs=(P(axis), P(axis)), check_vma=False)
    def run_shard(iq_local, state_local):
        blocks = iq_local[..., : nblocks * bs].reshape(
            iq_local.shape[0], nblocks, bs)
        blocks = jax.numpy.moveaxis(blocks, 1, 0)

        def scan_fn(st, blk):
            return rx.step(st, blk)

        final, outs = jax.lax.scan(scan_fn, state_local, blocks)
        scalar = {k for k, v in outs.items() if v.ndim == 2}
        outs = {k: jax.numpy.moveaxis(v, 0, 1).reshape(v.shape[1], -1)
                for k, v in outs.items()}
        if tail_bs:
            final, tout = rx.step(
                final, iq_local[..., nblocks * bs: nblocks * bs + tail_bs])
            outs = {k: jax.numpy.concatenate(
                [outs[k], tout[k][..., None] if k in scalar else tout[k]],
                axis=-1) for k in outs}
        return outs, final

    outs, final = jax.jit(run_shard)(iq, state)
    if n_pad:
        outs = {k: v[:n_ch] for k, v in outs.items()}
        final = jax.tree.map(
            lambda l: l[:n_ch] if hasattr(l, "ndim") and l.ndim and
            l.shape[0] == n_ch + n_pad else l, final)
    return outs, final

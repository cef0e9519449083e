"""Pallas kernel equivalence tests (interpret mode on CPU; the same kernels
compile natively on TPU — exercised by bench.py and the driver's entry)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdr_tpu.io.gen import generate_sin
from sdr_tpu.ops.pll import pll, pll_init
from sdr_tpu.ops.pallas.pll_kernel import pll_pallas

INTERP = jax.default_backend() != "tpu"


def test_pll_pallas_matches_scan_single():
    fs = 240e3
    pilot = generate_sin(fs, 19e3, 2048, amplitude=0.5)
    ref, ref_st = pll(jnp.asarray(pilot), pll_init(), freq=19e3, fs=fs,
                      nco_scale=2.0)
    out, st = pll_pallas(jnp.asarray(pilot), pll_init(), freq=19e3, fs=fs,
                         nco_scale=2.0, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    np.testing.assert_allclose(float(st.phase_acc), float(ref_st.phase_acc),
                               atol=1e-3)


def test_pll_pallas_batched_and_chunked():
    fs = 240e3
    x = np.stack([generate_sin(fs, 19e3, 3000, amplitude=0.4),
                  generate_sin(fs, 19e3, 3000, amplitude=0.4, phase=1.2),
                  generate_sin(fs, 18990.0, 3000, amplitude=0.3)])
    ref, _ = pll(jnp.asarray(x), pll_init((3,)), freq=19e3, fs=fs,
                 nco_scale=2.0)
    # chunk=1000 forces the outer scan path (3 chunks)
    out, _ = pll_pallas(jnp.asarray(x), pll_init((3,)), freq=19e3, fs=fs,
                        nco_scale=2.0, chunk=1000, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_pll_pallas_chunked_matches_xla_chunked():
    """The VMEM chunked kernel implements the same frozen-feedback math as
    ops.pll.pll_chunked (atan2 differs by the ~1e-5 rad polynomial)."""
    from sdr_tpu.ops.pll import pll_chunked
    from sdr_tpu.ops.pallas.pll_kernel import pll_pallas_chunked
    fs = 240e3
    x = np.stack([generate_sin(fs, 19e3, 6400, amplitude=0.4),
                  generate_sin(fs, 19e3, 6400, amplitude=0.4, phase=1.2)])
    ref, ref_st = pll_chunked(jnp.asarray(x), pll_init((2,)), freq=19e3,
                              fs=fs, nco_scale=2.0, chunk=32)
    out, st = pll_pallas_chunked(jnp.asarray(x), pll_init((2,)), freq=19e3,
                                 fs=fs, nco_scale=2.0, chunk=32,
                                 interpret=INTERP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-3)
    np.testing.assert_allclose(np.asarray(st.phase_acc),
                               np.asarray(ref_st.phase_acc), atol=3e-3)


def test_pll_pallas_chunked_block_continuity():
    from sdr_tpu.ops.pallas.pll_kernel import pll_pallas_chunked
    fs = 240e3
    pilot = generate_sin(fs, 19e3, 6400, amplitude=0.5)
    full, _ = pll_pallas_chunked(jnp.asarray(pilot), pll_init(), freq=19e3,
                                 fs=fs, nco_scale=2.0, interpret=INTERP)
    a, st = pll_pallas_chunked(jnp.asarray(pilot[:3200]), pll_init(),
                               freq=19e3, fs=fs, nco_scale=2.0,
                               interpret=INTERP)
    b, _ = pll_pallas_chunked(jnp.asarray(pilot[3200:]), st, freq=19e3,
                              fs=fs, nco_scale=2.0, interpret=INTERP)
    np.testing.assert_allclose(
        np.asarray(full), np.concatenate([np.asarray(a), np.asarray(b)]),
        atol=1e-3)


def test_pll_pallas_block_continuity():
    """Two chained calls == one call (state carry across kernel launches)."""
    fs = 240e3
    pilot = generate_sin(fs, 19e3, 2000, amplitude=0.5)
    full, _ = pll_pallas(jnp.asarray(pilot), pll_init(), freq=19e3, fs=fs,
                         nco_scale=2.0, interpret=INTERP)
    a, st = pll_pallas(jnp.asarray(pilot[:1000]), pll_init(), freq=19e3,
                       fs=fs, nco_scale=2.0, interpret=INTERP)
    b, _ = pll_pallas(jnp.asarray(pilot[1000:]), st, freq=19e3, fs=fs,
                      nco_scale=2.0, interpret=INTERP)
    np.testing.assert_allclose(
        np.asarray(full), np.concatenate([np.asarray(a), np.asarray(b)]),
        atol=1e-3)


def test_frontend_demod_call_matches_two_stage():
    """demod_call (front-end + discriminator in one kernel) is bit-identical
    to __call__ followed by fm_discriminator, including two-block state
    carry and the RSSI power-sum side output."""
    from sdr_tpu.ops.demod import fm_discriminator
    from sdr_tpu.ops.firdes import lowpass
    from sdr_tpu.ops.pallas.frontend_kernel import FusedFrontend

    coeff = np.asarray(lowpass(2.4e6, 100e3, 51))
    fe = FusedFrontend(coeff, 10, out_tile=128, sub_tiles=2)
    rng = np.random.default_rng(7)
    tail = fe.init_state((4,))
    prev_i = jnp.zeros((4,), jnp.float32)
    prev_q = jnp.zeros((4,), jnp.float32)
    for _ in range(2):  # second block exercises tail + prev carry
        u8 = jnp.asarray(rng.integers(0, 256, size=(4, 2 * 10 * 256),
                                      dtype=np.uint8))
        i_ds, q_ds, tail2 = fe(u8, tail, interpret=INTERP)
        fm_ref, pi_ref, pq_ref = fm_discriminator(i_ds, q_ds, prev_i, prev_q)
        fm, tail, prev_i, prev_q, power = fe.demod_call(
            u8, tail, prev_i, prev_q, interpret=INTERP)
        np.testing.assert_array_equal(np.asarray(fm), np.asarray(fm_ref))
        np.testing.assert_array_equal(np.asarray(tail), np.asarray(tail2))
        np.testing.assert_array_equal(np.asarray(prev_i), np.asarray(pi_ref))
        np.testing.assert_array_equal(np.asarray(prev_q), np.asarray(pq_ref))
        np.testing.assert_allclose(
            np.asarray(power),
            np.asarray(jnp.sum(i_ds * i_ds + q_ds * q_ds, axis=-1)),
            rtol=1e-5)


def test_receiver_fuse_demod_flag_equivalent():
    """Receiver(fuse_demod=True) == Receiver(fuse_demod=False) bit-for-bit
    on the fused f32 front-end (mono + rssi outputs)."""
    from sdr_tpu.models.receiver import Receiver
    from sdr_tpu import tx
    from sdr_tpu.config import MODES

    cfg = MODES[0]
    cap = tx.synthesize_capture(cfg, seconds=0.2,
                                mono=tx.tone(cfg.rf_fs, 800.0,
                                             int(0.2 * cfg.rf_fs)))
    out_a, _ = Receiver(0, fused_frontend=True, fuse_demod=True,
                        emit_rssi=True).run(cap)
    out_b, _ = Receiver(0, fused_frontend=True, fuse_demod=False,
                        emit_rssi=True).run(cap)
    np.testing.assert_array_equal(np.asarray(out_a["mono"]),
                                  np.asarray(out_b["mono"]))
    np.testing.assert_allclose(np.asarray(out_a["rssi_db"]),
                               np.asarray(out_b["rssi_db"]), atol=1e-4)


def test_fused_frontend_bf16_demod_interpret():
    """ADVICE r2: the bf16 fused front-end WITH in-kernel discriminator (the
    bench.py production path) exercised in interpret mode — fm_demod within
    bf16 coefficient-rounding tolerance of the exact two-stage path, and
    the misc-ref carry (prev_i/prev_q/power) consistent across blocks."""
    from sdr_tpu.ops.demod import fm_discriminator
    from sdr_tpu.ops.firdes import lowpass
    from sdr_tpu.ops.pallas.frontend_kernel import FusedFrontend

    coeff = np.asarray(lowpass(2.4e6, 100e3, 51))
    fe = FusedFrontend(coeff, 10, out_tile=128, sub_tiles=2,
                       compute_dtype=jnp.bfloat16)
    fe_exact = FusedFrontend(coeff, 10, out_tile=128, sub_tiles=2)
    rng = np.random.default_rng(3)
    tail = fe.init_state((2,))
    prev_i = jnp.zeros((2,), jnp.float32)
    prev_q = jnp.zeros((2,), jnp.float32)
    tail_e = fe_exact.init_state((2,))
    prev_ie = jnp.zeros((2,), jnp.float32)
    prev_qe = jnp.zeros((2,), jnp.float32)
    for _ in range(2):  # second block exercises the misc-ref carry
        u8 = jnp.asarray(rng.integers(0, 256, size=(2, 2 * 10 * 256),
                                      dtype=np.uint8))
        fm, tail, prev_i, prev_q, power = fe.demod_call(
            u8, tail, prev_i, prev_q, interpret=INTERP)
        i_e, q_e, tail_e = fe_exact(u8, tail_e, interpret=INTERP)
        fm_e, prev_ie, prev_qe = fm_discriminator(i_e, q_e, prev_ie, prev_qe)
        # bf16 coefficient rounding: ~53 dB channelizer SNR propagates
        # through the discriminator's ratio; compare waveforms loosely and
        # the block power tightly
        err = np.asarray(fm) - np.asarray(fm_e)
        sig = np.mean(np.square(np.asarray(fm_e)))
        assert np.mean(np.square(err)) < 0.05 * max(sig, 1e-9)
        np.testing.assert_allclose(
            np.asarray(power),
            np.asarray(jnp.sum(i_e * i_e + q_e * q_e, axis=-1)),
            rtol=2e-2)


def test_fused_ifbank_matches_xla_chain():
    """FusedIFBank (all post-demod IF FIRs as banded MXU matmuls) is
    reduction-order-identical to the MultiFIR + square + carrier-BPF XLA
    path, including two-block tail carry."""
    from sdr_tpu.models.receiver import Receiver
    from sdr_tpu import tx
    from sdr_tpu.config import MODES

    cfg = MODES[0]
    sec = 0.3
    n = int(sec * cfg.rf_fs)
    cap = tx.synthesize_capture(cfg, seconds=sec,
                                left=tx.tone(cfg.rf_fs, 1000.0, n),
                                right=tx.tone(cfg.rf_fs, 2500.0, n))
    base = Receiver(0, stereo=True, rds=True, pll_impl="ff")
    fused = Receiver(0, stereo=True, rds=True, pll_impl="ff",
                     fused_ifbank=True)
    bs = fused.block_size_u8()
    ob, _ = base.run(cap[: 4 * bs], blocks_per_step=1)
    of, _ = fused.run(cap[: 4 * bs], blocks_per_step=1)
    for k in ("left", "right", "rds_soft"):
        np.testing.assert_allclose(np.asarray(of[k]), np.asarray(ob[k]),
                                   atol=1e-5)


def test_int8x2_frontend_bit_exact_vs_integer_oracle():
    """The exact-integer front end (fused_frontend='int8x2') is BIT-identical
    to an independent NumPy integer-matmul oracle of the same 15-bit
    fixed-point math — integer accumulation is associative, so the result
    is reproducible under any tiling (a determinism guarantee the float
    engines, including the direct XLA f32 conv, cannot make).  VERDICT r3
    next-round item 4 (make bit-exact fast)."""
    from sdr_tpu.ops import firdes
    from sdr_tpu.ops.pallas.frontend_kernel import (FusedFrontend,
                                                    _build_band_matrix,
                                                    _quantize_limbs)

    coeff = firdes.lowpass(2.4e6, 100e3, 51, 1)
    rng = np.random.default_rng(0)
    C, n = 4, 2 * 10 * 512
    u8 = rng.integers(0, 256, size=(C, n), dtype=np.uint8)

    for sub_tiles in (1, 2):
        fe = FusedFrontend(coeff, 10, compute_dtype="int8x2",
                           sub_tiles=sub_tiles)
        tail = np.asarray(fe.init_state((C,)))
        i_ds, q_ds, _ = fe(jnp.asarray(u8), jnp.asarray(tail),
                           interpret=True)

        hi, lo, scale = _quantize_limbs(_build_band_matrix(
            np.asarray(coeff, np.float64), 10, fe.out_tile // fe.sub_tiles,
            fe.tail_u8))
        xi = np.concatenate([tail, u8], axis=-1).astype(np.int64) - 128
        ot = fe.out_tile // fe.sub_tiles
        n_out = n // 20
        a_int = hi.astype(np.int64) * 128 + lo.astype(np.int64)
        i_or = np.zeros((C, n_out), np.float32)
        q_or = np.zeros((C, n_out), np.float32)
        for blk in range(n_out // ot):
            w = xi[:, blk * 2 * 10 * ot: blk * 2 * 10 * ot + a_int.shape[0]]
            f = (w @ a_int).astype(np.float32) * np.float32(scale / 128.0)
            i_or[:, blk * ot:(blk + 1) * ot] = f[:, :ot]
            q_or[:, blk * ot:(blk + 1) * ot] = f[:, ot:]
        assert np.array_equal(np.asarray(i_ds), i_or), sub_tiles
        assert np.array_equal(np.asarray(q_ds), q_or), sub_tiles


def test_int8x2_full_chain_matches_exact_f32():
    """Full mono chain (demod fused in-kernel) on int8x2: >100 dB stream
    agreement with the exact-f32 path (15-bit coefficient quantization is
    ~60 dB below the FM chain's own floor) and bit-level deterministic."""
    from sdr_tpu.models.receiver import Receiver
    from sdr_tpu import tx
    from sdr_tpu.config import MODES

    cfg = MODES[0]
    n = int(0.2 * cfg.rf_fs)
    cap = tx.synthesize_capture(cfg, seconds=0.2,
                                mono=tx.tone(cfg.rf_fs, 1000.0, n))
    o_r, _ = Receiver(0).run(cap, blocks_per_step=2)
    rxi = Receiver(0, fused_frontend="int8x2")
    o_i, _ = rxi.run(cap, blocks_per_step=2)
    a, b = np.asarray(o_r["mono"]), np.asarray(o_i["mono"])
    snr = 20 * np.log10(np.sqrt(np.mean(a * a))
                        / (np.sqrt(np.mean((a - b) ** 2)) + 1e-30))
    assert snr > 100.0, f"int8x2 vs f32 stream SNR {snr:.1f} dB"
    o_i2, _ = rxi.run(cap, blocks_per_step=2)
    assert np.array_equal(b, np.asarray(o_i2["mono"]))


def test_fused_synth_mix_matches_unfused():
    """The ffmix Pallas pass (carrier synthesis + both mixers in-register,
    ops/pallas/ffmix_kernel.py) and the audio-pair kernel
    (ops/pallas/audio_kernel.py) reproduce the unfused XLA path: mono is
    reduction-order-identical; stereo/RDS agree at the bf16-profile noise
    class across multi-block state carry."""
    from sdr_tpu import tx
    from sdr_tpu.config import MODES
    from sdr_tpu.models.receiver import Receiver
    from sdr_tpu.rds import tx as rds_tx

    cfg = MODES[0]
    sec = 0.6
    n = int(sec * cfg.rf_fs)
    bits = rds_tx.standard_group_stream(pi=0x3D44, ps_name="TPU FM  ",
                                        n_groups=8)
    cap = tx.synthesize_capture(
        cfg, seconds=sec, left=tx.tone(cfg.rf_fs, 1000.0, n),
        right=tx.tone(cfg.rf_fs, 2500.0, n),
        rds_baseband=rds_tx.bits_to_baseband(bits, cfg.rf_fs)[:n], a_rds=0.1)
    KW = dict(stereo=True, rds=True, pll_impl="ff", fused_ifbank="bf16",
              conv_engine="tiled", conv_dtype="bf16", fused_frontend="int8")
    rx_f = Receiver(0, fused_synth=True, **KW)
    assert rx_f._fused_synth and rx_f._audio_pair is not None
    a, _ = Receiver(0, fused_synth=False, **KW).run(cap, blocks_per_step=4)
    b, _ = rx_f.run(cap, blocks_per_step=4)
    for k, min_snr in (("mono", 100.0), ("left", 45.0), ("right", 45.0),
                       ("rds_soft", 45.0)):
        x = np.asarray(a[k], np.float32)
        y = np.asarray(b[k], np.float32)
        snr = 10 * np.log10(np.mean(x * x)
                            / max(np.mean((x - y) ** 2), 1e-30))
        assert snr > min_snr, f"{k}: {snr:.1f} dB"


def test_int8_frontend_snr():
    """The single-limb int8 front end (throughput engine) stays far above
    the FM chain's distortion floor vs the exact f32 path."""
    from sdr_tpu import tx
    from sdr_tpu.config import MODES
    from sdr_tpu.models.receiver import Receiver

    cfg = MODES[0]
    n = int(0.2 * cfg.rf_fs)
    cap = tx.synthesize_capture(cfg, seconds=0.2,
                                mono=tx.tone(cfg.rf_fs, 1000.0, n))
    a = np.asarray(Receiver(0).run(cap, blocks_per_step=2)[0]["mono"])
    b = np.asarray(Receiver(0, fused_frontend="int8").run(
        cap, blocks_per_step=2)[0]["mono"])
    snr = 10 * np.log10(np.mean(a * a) / max(np.mean((a - b) ** 2), 1e-30))
    assert snr > 60.0, f"int8 fe stream SNR {snr:.1f} dB"

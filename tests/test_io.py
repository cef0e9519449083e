"""Stream codec tests: u8 ingest, s16 egress, block framing, WAV, native ring."""

import io
import os

import numpy as np
import pytest

import jax.numpy as jnp

from sdr_tpu.io.stream import (decode_u8_iq, interleave_stereo_s16, pack_s16,
                               read_u8_blocks, u8_to_f32)
from sdr_tpu.io.wav import float_to_wav_s16, read_wav, write_wav


def test_u8_normalize_exact():
    """(x - 128)/128 in [-1, 1) (reference src/iofunc.cpp:67)."""
    raw = jnp.arange(256, dtype=jnp.uint8)
    f = np.asarray(u8_to_f32(raw))
    assert f[0] == -1.0 and f[128] == 0.0
    assert np.isclose(f[255], 127 / 128)


def test_decode_deinterleave():
    raw = jnp.asarray(np.array([10, 20, 30, 40, 50, 60], dtype=np.uint8))
    i, q = decode_u8_iq(raw)
    np.testing.assert_allclose(np.asarray(i), (np.array([10, 30, 50]) - 128) / 128)
    np.testing.assert_allclose(np.asarray(q), (np.array([20, 40, 60]) - 128) / 128)


def test_pack_s16_nan_guard_and_gain():
    """NaN->0, x16384, C-style truncation (reference src/project.cpp:183-193)."""
    x = jnp.asarray(np.array([0.5, -0.5, np.nan, 1.9999, -1.0], np.float32))
    out = np.asarray(pack_s16(x))
    assert out[0] == 8192 and out[1] == -8192
    assert out[2] == 0
    assert out[3] == int(1.9999 * 16384)  # truncation toward zero
    assert out[4] == -16384


def test_stereo_interleave_order():
    """Interleaved (R, L) pairs like the reference (src/project.cpp:184-191)."""
    left = jnp.asarray(np.array([0.25, 0.5], np.float32))
    right = jnp.asarray(np.array([-0.25, -0.5], np.float32))
    out = np.asarray(interleave_stereo_s16(left, right))
    assert list(out) == [-4096, 4096, -8192, 8192]


def test_read_u8_blocks_drops_partial():
    stream = io.BytesIO(bytes(range(10)) * 25)  # 250 bytes
    blocks = list(read_u8_blocks(stream, 100))
    assert len(blocks) == 2  # 50-byte tail dropped like the reference EOF path
    assert blocks[0][0] == 0 and len(blocks[1]) == 100


def test_wav_roundtrip(tmp_path):
    path = str(tmp_path / "t.wav")
    data = (np.sin(np.linspace(0, 20, 480)) * 20000).astype(np.int16)
    write_wav(path, 48000, data)
    rate, back = read_wav(path)
    assert rate == 48000
    np.testing.assert_array_equal(back, data)
    stereo = np.stack([data, -data], axis=1)
    write_wav(path, 44100, stereo)
    rate, back = read_wav(path)
    assert rate == 44100 and back.shape == stereo.shape


def test_golden_scaling():
    """Golden-model WAV scaling (x/2)*32767 (model/fmMonoBlock.py:297)."""
    x = np.array([2.0, -2.0, 0.0])
    np.testing.assert_array_equal(float_to_wav_s16(x), [32767, -32767, 0])


def test_native_ring_roundtrip():
    from sdr_tpu import native
    if not native.available():
        pytest.skip("no native toolchain")
    r, w = os.pipe()
    payload = np.arange(256, dtype=np.uint8).tobytes() * 8
    os.write(w, payload)
    os.close(w)
    reader = native.BlockReader(r, 512, capacity=2)
    blocks = list(reader)
    reader.close()
    assert b"".join(b.tobytes() for b in blocks) == payload


def test_native_reader_keeps_partial_tail():
    """The partial final block at EOF is retained for the consumer's
    aligned flush (tail()), not silently dropped."""
    from sdr_tpu import native
    if not native.available():
        pytest.skip("no native toolchain")
    r, w = os.pipe()
    payload = bytes(range(256)) * 3  # 768 bytes = 1 full 512-block + 256
    os.write(w, payload)
    os.close(w)
    reader = native.BlockReader(r, 512, capacity=2)
    blocks = list(reader)
    tail = reader.tail()
    reader.close()
    assert len(blocks) == 1 and blocks[0].tobytes() == payload[:512]
    assert tail.tobytes() == payload[512:]


def test_sync_reader_keeps_partial_tail():
    import io

    from sdr_tpu.io.stream import SyncBlockReader
    payload = bytes(range(200))
    src = SyncBlockReader(io.BytesIO(payload), 64)
    blocks = list(src)
    assert len(blocks) == 3
    assert src.tail().tobytes() == payload[192:]


def test_native_writer_drains_on_close(tmp_path):
    """BlockWriter (the CLI audio sink) must flush every queued block
    before destroy returns — bytes written off-thread land in order."""
    from sdr_tpu import native
    if not native.available():
        pytest.skip("no native toolchain")
    dst = tmp_path / "audio.bin"
    payload = [bytes([i]) * 1024 for i in range(32)]
    with open(dst, "wb") as f:
        w = native.BlockWriter(f.fileno(), capacity=4)
        for p in payload:
            w.push(p)
        w.close()  # joins after draining
    assert dst.read_bytes() == b"".join(payload)

"""Unit tests: CRC-16-CCITT bitwise vs matrix forms + soft gate."""

import numpy as np

from tetraear_tpu.frame import crc


def test_known_vector():
    # CRC-16/CCITT-FALSE of ASCII "123456789" is 0x29B1.
    data = b"123456789"
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    out = crc.crc16_bits(bits)
    val = 0
    for b in out:
        val = (val << 1) | int(b)
    assert val == 0x29B1


def test_matrix_equals_bitwise(rng):
    for length in (64, 200, 216):
        bits = rng.integers(0, 2, length).astype(np.uint8)
        assert np.array_equal(crc.crc16_bits(bits),
                              crc.crc16_batch(bits)[0])


def test_batch_shape(rng):
    batch = rng.integers(0, 2, (16, 200)).astype(np.uint8)
    out = crc.crc16_batch(batch)
    assert out.shape == (16, 16)
    for i in range(16):
        assert np.array_equal(out[i], crc.crc16_bits(batch[i]))


def test_soft_crc_accepts_clean_and_2bit_errors(rng):
    payload = rng.integers(0, 2, 200).astype(np.uint8)
    framed = crc.append_crc(payload)
    assert crc.soft_crc_check(framed)
    bad = framed.copy()
    bad[-1] ^= 1
    bad[-9] ^= 1                            # 2 errors in the CRC tail
    assert crc.soft_crc_check(bad)          # <=2 errors allowed
    worse = framed.copy()
    worse[[-1, -5, -9, -13]] ^= 1           # 4 errors -> reject
    assert not crc.soft_crc_check(worse)


def test_soft_crc_rejects_degenerate():
    assert not crc.soft_crc_check(np.zeros(100, np.uint8))
    assert not crc.soft_crc_check(np.ones(100, np.uint8))
    assert not crc.soft_crc_check(np.zeros(8, np.uint8))

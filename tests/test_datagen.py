"""Data generator correctness: RFC 8439 ChaCha20 vector for the core, plus
protocol invariants of the benchmark cloud (benches/cellgrid.rs:16-35)."""

import numpy as np

from zelll_tpu.utils.datagen import (
    DEFAULT_SEED,
    StdRng,
    _chacha_core,
    _pcg32_seed_fill,
    generate_points_random,
    lj_box,
)


def test_chacha_core_rfc8439():
    # RFC 8439 section 2.3.2 test vector (ChaCha20 block function)
    key = np.array(
        [0x03020100, 0x07060504, 0x0B0A0908, 0x0F0E0D0C,
         0x13121110, 0x17161514, 0x1B1A1918, 0x1F1E1D1C],
        dtype=np.uint32,
    )
    state = np.empty((1, 16), dtype=np.uint32)
    state[0, 0:4] = [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574]
    state[0, 4:12] = key
    state[0, 12] = 1  # counter
    state[0, 13:16] = [0x09000000, 0x4A000000, 0x00000000]  # nonce
    out = _chacha_core(state, 20)[0]
    expected = np.array(
        [0xE4E7F110, 0x15593BD1, 0x1FDD0F50, 0xC47120A3,
         0xC7F4D1C7, 0x0368C033, 0x9AAA2204, 0x4E6CD4C3,
         0x466482D2, 0x09AA9F07, 0x05D7C214, 0xA2028BD9,
         0xD19C12B5, 0xB94E16DE, 0xE883D0CB, 0x4E3C50A2],
        dtype=np.uint32,
    )
    np.testing.assert_array_equal(out, expected)


def test_pcg32_seed_fill_known_relation():
    # PCG32 XSH-RR from a fixed LCG state is deterministic; pin a value so
    # accidental changes are caught (computed from the published recurrence).
    w = _pcg32_seed_fill(0, 2)
    state1 = 11634580027462260723  # 0*MUL + INC
    xorshifted = (((state1 >> 18) ^ state1) >> 27) & 0xFFFFFFFF
    rot = state1 >> 59
    want0 = ((xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))) & 0xFFFFFFFF
    assert w[0] == want0


def test_stream_is_contiguous_across_calls():
    a = StdRng(DEFAULT_SEED)
    b = StdRng(DEFAULT_SEED)
    whole = a.next_u64(40)
    parts = np.concatenate([b.next_u64(7), b.next_u64(1), b.next_u64(32)])
    np.testing.assert_array_equal(whole, parts)


def test_uniform_range_and_determinism():
    u = StdRng(DEFAULT_SEED).uniform_f64(10000)
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 0.02
    np.testing.assert_array_equal(u[:5], StdRng(DEFAULT_SEED).uniform_f64(5))


def test_benchmark_cloud_protocol():
    n = 1000
    vol = lj_box(n)
    assert vol[:2] == (30.0, 30.0)
    np.testing.assert_allclose(vol[2], n / 0.01 / 900)
    pts = generate_points_random(n, vol)
    assert pts.shape == (n, 3)
    # centered cuboid
    for k in range(3):
        assert pts[:, k].min() >= -vol[k] / 2
        assert pts[:, k].max() <= vol[k] / 2
    # deterministic
    np.testing.assert_array_equal(pts[:10], generate_points_random(10, vol))

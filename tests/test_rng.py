"""MT19937 twin parity (reference: test/random_array.hpp)."""

import numpy as np

from various_image_processings_tpu.core.rng import MT19937, random_array


def test_mt19937_canonical_10000th():
    # The canonical std::mt19937 check: the 10000th draw from seed 5489.
    assert MT19937(5489).raw(10000)[9999] == 4123659995


def test_random_array_u8_matches_cpp_stream():
    # Verified byte-for-byte against the compiled reference fixture
    # (std::mt19937(42), value = rand() % 255).
    expected = [132, 167, 181, 199, 126, 125, 70, 164, 85, 38]
    got = random_array(10)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, expected)


def test_random_array_f32_matches_cpp_stream():
    expected = np.array([95.507729, 203.118469, 242.432144, 46.775871], np.float32)
    got = random_array(4, 255.0, np.float32)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, expected)


def test_random_array_never_emits_max():
    vals = random_array(5000)
    assert vals.max() <= 254  # rand() % 255

import numpy as np

from segmentation_training_pipeline_tpu.utils.rle import rle_decode, rle_encode


def test_roundtrip_random():
    r = np.random.RandomState(0)
    for _ in range(10):
        m = (r.rand(13, 17) > 0.6).astype(np.uint8)
        assert np.array_equal(rle_decode(rle_encode(m), m.shape), m)


def test_known_value_column_major():
    m = np.zeros((3, 3), np.uint8)
    m[0, 0] = 1  # flat index 1 (column-major, 1-indexed)
    m[2, 1] = 1  # column 1 -> flat 3*1 + 2 + 1 = 6
    assert rle_encode(m) == "1 1 6 1"


def test_empty_and_full():
    assert rle_encode(np.zeros((4, 4))) == ""
    assert np.array_equal(rle_decode("", (4, 4)), np.zeros((4, 4)))
    full = np.ones((4, 4), np.uint8)
    assert np.array_equal(rle_decode(rle_encode(full), (4, 4)), full)


def test_decode_nan_like():
    assert rle_decode(None, (2, 2)).sum() == 0
    assert rle_decode("nan", (2, 2)).sum() == 0

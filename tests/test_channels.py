import numpy as np
import pytest

from zdcsim.ops.channels import channel_basis, get_channel_masks, sum_channels, sum_channels_np


def _reference_style_masks(shape):
    """Independent loop-based construction following the published ZDC
    5-tower decomposition (checkerboard + quadrants) for cross-validation."""
    n, m = shape
    mask = np.ones(shape, dtype=np.float32)
    pattern = np.array([[0, 1], [1, 0]], dtype=np.float32)
    for i in range(n):
        for j in range(m):
            mask[i, j] = pattern[i % 2, j % 2]
    mask5 = np.ones(shape, dtype=np.float32) - mask
    mid_row, mid_col = n // 2, m // 2
    m1, m2, m3, m4 = mask.copy(), mask.copy(), mask.copy(), mask.copy()
    m4[mid_row:, :] = 0
    m4[:, :mid_col] = 0
    m2[:, :mid_col] = 0
    m2[:mid_row, :] = 0
    m3[mid_row:, :] = 0
    m3[:, mid_col:] = 0
    m1[:, mid_col:] = 0
    m1[:mid_row, :] = 0
    return m1, m2, m3, m4, m5 if (m5 := mask5) is not None else mask5


@pytest.mark.parametrize("shape", [(56, 30), (44, 44), (6, 5)])
def test_masks_match_reference_semantics(shape):
    ours = get_channel_masks(shape)
    ref = _reference_style_masks(shape)
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("shape", [(56, 30), (44, 44)])
def test_masks_partition_properties(shape):
    m1, m2, m3, m4, m5 = get_channel_masks(shape)
    # checkerboard channels are disjoint from channel 5
    for m in (m1, m2, m3, m4):
        assert np.all(m * m5 == 0)
    # quadrant channels are mutually disjoint
    quads = [m1, m2, m3, m4]
    for i in range(4):
        for j in range(i + 1, 4):
            assert np.all(quads[i] * quads[j] == 0)
    # every pixel belongs to exactly one of the five channels
    assert np.all(m1 + m2 + m3 + m4 + m5 == 1)


def test_sum_channels_matches_mask_multiply(rng):
    imgs = rng.random((7, 56, 30)).astype(np.float32)
    masks = get_channel_masks((56, 30))
    expected = np.stack([(imgs * m).sum(axis=(1, 2)) for m in masks], axis=1)
    got = np.asarray(sum_channels(imgs))
    np.testing.assert_allclose(got, expected, rtol=1e-5)
    np.testing.assert_allclose(sum_channels_np(imgs), expected, rtol=1e-5)


def test_sum_channels_expm1_path(rng):
    imgs = rng.random((4, 44, 44)).astype(np.float32)
    got = np.asarray(sum_channels(imgs, already_expm1=False))
    expected = sum_channels_np(np.expm1(imgs))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_sum_channels_accepts_nchw(rng):
    imgs = rng.random((3, 1, 56, 30)).astype(np.float32)
    got = np.asarray(sum_channels(imgs))
    assert got.shape == (3, 5)


def test_channel_basis_shape():
    b = channel_basis((56, 30))
    assert b.shape == (56 * 30, 5)
    assert set(np.unique(b)) <= {0.0, 1.0}

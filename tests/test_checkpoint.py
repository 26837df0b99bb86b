"""Wexler checkpoint/resume (aux subsystem; the reference has none —
SURVEY.md §5)."""

import numpy as np

from various_image_processings_tpu.models.inpainting import WexlerInpainting


def make_case(size=72):
    img = np.zeros((size, size, 3), np.uint8)
    stripes = ((np.arange(size) // 4) % 2 * 180 + 40).astype(np.uint8)
    img[:, :, :] = stripes[None, :, None]
    mask = np.zeros((size, size), np.uint8)
    mask[30:38, 30:38] = 255
    return img, mask


def test_checkpoint_roundtrip(tmp_path):
    img, mask = make_case()
    direct = WexlerInpainting().apply(img, mask)

    ckdir = str(tmp_path / "ck")
    with_ck = WexlerInpainting(checkpoint_dir=ckdir).apply(img, mask)
    np.testing.assert_array_equal(with_ck, direct)

    # resume: the saved state has next_layer == -1 → apply returns instantly
    # with the same result
    resumed = WexlerInpainting(checkpoint_dir=ckdir).apply(img, mask)
    np.testing.assert_array_equal(resumed, direct)


def test_checkpoint_ignored_on_shape_change(tmp_path):
    img, mask = make_case()
    ckdir = str(tmp_path / "ck")
    WexlerInpainting(checkpoint_dir=ckdir).apply(img, mask)
    img2, mask2 = make_case(80)
    out = WexlerInpainting(checkpoint_dir=ckdir).apply(img2, mask2)
    assert out.shape == img2.shape

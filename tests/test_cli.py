"""CLI plumbing: rendering helpers and end-to-end runs on tiny images
(the compute itself is covered by the op tests)."""

import numpy as np
import pytest

from various_image_processings_tpu.cli.slic import draw_contour, draw_superpixel
from various_image_processings_tpu.cli.benchmark import parse_config


def test_draw_contour_marks_boundaries_and_edges():
    labels = np.zeros((4, 4), np.int32)
    labels[:, 2:] = 1
    edge = draw_contour(labels)
    # reference semantics: out-of-range right/down neighbours compare to -1,
    # so the last row/col are always contour (sample/slic/main.cpp:13-21)
    assert (edge[:, 1] == 255).all()      # boundary between 0|1
    assert (edge[:, -1] == 255).all()
    assert (edge[-1, :] == 255).all()
    assert (edge[:3, 0] == 0).all()


def test_draw_superpixel_mean_colors():
    labels = np.array([[0, 0], [1, 1]], np.int32)
    img = np.zeros((2, 2, 3), np.uint8)
    img[0] = (10, 20, 30)
    img[1] = (50, 60, 70)
    out = draw_superpixel(img, labels)
    np.testing.assert_array_equal(out[0, 0], (10, 20, 30))
    np.testing.assert_array_equal(out[1, 1], (50, 60, 70))


def test_parse_config_defaults_and_toml(tmp_path):
    cfg = parse_config(None)
    assert cfg["execute_times"] == 50
    assert cfg["BilateralFilter"]["ksize"] == 9
    p = tmp_path / "cfg.toml"
    p.write_text("execute_times = 3\n[BilateralFilter]\nksize = 5\n")
    cfg = parse_config(str(p))
    assert cfg["execute_times"] == 3
    assert cfg["BilateralFilter"]["ksize"] == 5
    assert cfg["BilateralTextureFilter"]["nitr"] == 3  # default preserved


def test_bilateral_cli_end_to_end(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from various_image_processings_tpu.cli.bilateral_filter import main
    from various_image_processings_tpu.core.rng import random_image
    src_path = str(tmp_path / "in.png")
    out_path = str(tmp_path / "out.png")
    cv2.imwrite(src_path, random_image(24, 24))
    main([src_path, "5", "10", "30", "-o", out_path, "--impl", "xla"])
    out = cv2.imread(out_path)
    assert out is not None and out.shape == (24, 24, 3)


def test_cli_side_by_side_composite(tmp_path):
    # headless twin of the reference samples' paired imshow windows:
    # input | result with a 2-px separator, float outputs normalized
    cv2 = pytest.importorskip("cv2")
    from various_image_processings_tpu.cli.gradient import main
    from various_image_processings_tpu.core.rng import random_image
    src_path = str(tmp_path / "in.png")
    out_path = str(tmp_path / "out.png")
    cv2.imwrite(src_path, random_image(16, 24))
    main([src_path, "-o", out_path, "--impl", "xla", "--side-by-side"])
    sbs = cv2.imread(str(tmp_path / "out_sbs.png"))
    assert sbs is not None and sbs.shape == (16, 24 * 2 + 2, 3)
    np.testing.assert_array_equal(sbs[:, 24:26], 255)  # separator
    src = cv2.imread(src_path)
    np.testing.assert_array_equal(sbs[:, :24], src)    # input pane verbatim

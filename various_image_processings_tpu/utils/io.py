"""Image I/O (PNG/JPG via OpenCV or PIL fallback). BGR u8, like the
reference's cv::imread-based samples."""

from __future__ import annotations

import numpy as np


def imread(path: str) -> np.ndarray:
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return np.asarray(img)
    except ImportError:
        from PIL import Image
        rgb = np.asarray(Image.open(path).convert("RGB"))
        return rgb[:, :, ::-1].copy()  # → BGR


def imread_gray(path: str) -> np.ndarray:
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(path)
        return np.asarray(img)
    except ImportError:
        from PIL import Image
        return np.asarray(Image.open(path).convert("L"))


def imwrite(path: str, img: np.ndarray) -> None:
    img = np.asarray(img)
    try:
        import cv2
        cv2.imwrite(path, img)
    except ImportError:
        from PIL import Image
        if img.ndim == 3:
            img = img[:, :, ::-1]  # BGR → RGB
        Image.fromarray(img).save(path)

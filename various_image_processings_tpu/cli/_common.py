"""Shared CLI plumbing for the per-algorithm samples.

The reference samples display results with cv::imshow; these headless twins
write PNGs next to the input (or to --output) and print timing.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from ..utils.io import imread, imwrite


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("filename", help="input image path")
    p.add_argument("--output", "-o", default=None,
                   help="output path (default: <input>_<algo>.png)")
    p.add_argument("--impl", default="auto", choices=("auto", "xla", "pallas"))
    return p


def load_image(path: str) -> np.ndarray:
    img = imread(path)
    print(f"input: {path} {img.shape[1]}x{img.shape[0]}")
    return img


def run_and_save(name: str, fn, args, out_default_suffix: str):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    out2 = fn()
    jax.block_until_ready(out2)
    t2 = time.perf_counter()
    print(f"{name}: compile+run {t1 - t0:.3f}s, warm {1e3 * (t2 - t1):.3f}ms")
    out_path = args.output
    if out_path is None:
        root, _ = os.path.splitext(args.filename)
        out_path = f"{os.path.basename(root)}_{out_default_suffix}.png"
    imwrite(out_path, np.asarray(out))
    print(f"wrote {out_path}")
    return out

"""CLI twin of sample/wexler_inpainting/main.cpp: ``image mask`` → writes
result.png."""

from __future__ import annotations

import sys

from ._common import base_parser
from ..utils.io import imread, imread_gray, imwrite


def main(argv=None):
    p = base_parser("Wexler exemplar-based inpainting")
    p.add_argument("mask", help="mask image (hole where > 0)")
    args = p.parse_args(argv)

    from ..ops.inpainting import inpainting_wexler
    img = imread(args.filename)
    mask = imread_gray(args.mask)
    result = inpainting_wexler(img, mask, verbose=True)
    out = args.output or "result.png"
    imwrite(out, result)
    print(f"wrote {out}")


if __name__ == "__main__":
    sys.exit(main())

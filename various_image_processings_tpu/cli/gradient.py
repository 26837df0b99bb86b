"""CLI twin of sample/gradient/main.cpp: ``filename``. The f32 magnitude is
rescaled to u8 by the image max for viewing, like the sample's
convert_to_u8 (sample/gradient/main.cpp:9-18)."""

from __future__ import annotations

import sys

import numpy as np

from ._common import base_parser, load_image, run_and_save


def main(argv=None):
    p = base_parser("Sobel-style gradient magnitude")
    args = p.parse_args(argv)

    from ..ops.gradient import gradient
    img = load_image(args.filename)

    def run():
        g = np.asarray(gradient(img, impl=args.impl))
        return (g * 255.0 / max(g.max(), 1e-9)).astype(np.uint8)

    run_and_save("gradient", run, args, "gradient")


if __name__ == "__main__":
    sys.exit(main())

"""Class-style filter API — shape-specialized executors.

Counterpart of the reference's pimpl classes (``CudaBilateralFilter``
include/cuda/bilateral_filter.hpp:7, ``CudaAdaptiveBilateralFilter``
include/cuda/adaptive_bilateral_filter.hpp:7, ``CudaBilateralTextureFilter``
include/cuda/bilateral_texture_filter.hpp:7): the constructor fixes the
image size and parameters and pre-builds everything reusable; calls then run
without per-call setup.  On TPU the ctor/execute split maps exactly onto
trace/compile time vs run time — ``warmup()`` (or the first call) triggers
the one-off XLA/Mosaic compilation, subsequent calls hit the executable
cache.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops._dispatch import resolve_impl
from ..ops.bilateral import _bf_jit, _jbf_jit
from ..ops.adaptive_bilateral import _abf_jit
from ..ops.bilateral_texture import _btf_jit


class _ShapeSpecialized:
    def __init__(self, height: int, width: int, impl: str):
        self.height = height
        self.width = width
        self.impl = resolve_impl(impl)

    def _check(self, img) -> jax.Array:
        img = jnp.asarray(img)
        if img.shape != (self.height, self.width, 3) or img.dtype != jnp.uint8:
            raise ValueError(
                f"expected ({self.height}, {self.width}, 3) u8, got "
                f"{tuple(img.shape)} {img.dtype}")
        return img

    def warmup(self):
        """Compile ahead of time on a zeros image."""
        z = jnp.zeros((self.height, self.width, 3), jnp.uint8)
        jax.block_until_ready(self(z))
        return self


class BilateralFilter(_ShapeSpecialized):
    """Reference: CudaBilateralFilter (include/cuda/bilateral_filter.hpp:7-31)."""

    def __init__(self, height: int, width: int, ksize: int = 9,
                 sigma_space: float = 10.0, sigma_color: float = 30.0,
                 impl: str = "auto"):
        super().__init__(height, width, impl)
        self.params = (int(ksize), float(sigma_space), float(sigma_color))

    def __call__(self, src) -> jax.Array:
        return _bf_jit(self._check(src), *self.params, self.impl)

    # reference method names
    bilateral_filter = __call__

    def joint_bilateral_filter(self, src, guide) -> jax.Array:
        return _jbf_jit(self._check(src), self._check(guide), *self.params,
                        self.impl)


class AdaptiveBilateralFilter(_ShapeSpecialized):
    """Reference: CudaAdaptiveBilateralFilter
    (include/cuda/adaptive_bilateral_filter.hpp:7-26)."""

    def __init__(self, height: int, width: int, ksize: int = 9,
                 sigma_space: float = 10.0, sigma_color: float = 30.0,
                 impl: str = "auto"):
        super().__init__(height, width, impl)
        self.params = (int(ksize), float(sigma_space), float(sigma_color))

    def __call__(self, src) -> jax.Array:
        return _abf_jit(self._check(src), *self.params, self.impl)

    adaptive_bilateral_filter = __call__


class BilateralTextureFilter(_ShapeSpecialized):
    """Reference: CudaBilateralTextureFilter
    (include/cuda/bilateral_texture_filter.hpp:7-19) /
    BilateralTextureFilterImpl (include/cpp/bilateral_texture_filter.hpp:151)."""

    def __init__(self, height: int, width: int, ksize: int = 9, nitr: int = 3,
                 impl: str = "auto"):
        super().__init__(height, width, impl)
        self.params = (int(ksize), int(nitr))

    def __call__(self, src) -> jax.Array:
        return _btf_jit(self._check(src), *self.params, self.impl)

    execute = __call__

"""Implementation dispatch: every op has an `xla` path (pure jax.numpy, runs
anywhere, fuses under jit) and a `pallas` path (hand-tiled TPU kernel).

`impl="auto"` picks pallas on TPU and xla elsewhere.  On non-TPU backends the
pallas path still runs (interpret mode) so its logic stays testable on the
CPU mesh used by the test suite.
"""

from __future__ import annotations

import functools

import jax

VALID_IMPLS = ("auto", "xla", "pallas")


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.cache
def pallas_ready() -> bool:
    try:
        from .pallas import bilateral  # noqa: F401
        return True
    except Exception:
        return False


def resolve_impl(impl: str) -> str:
    if impl not in VALID_IMPLS:
        raise ValueError(f"impl must be one of {VALID_IMPLS}, got {impl!r}")
    if impl == "auto":
        return "pallas" if (on_tpu() and pallas_ready()) else "xla"
    return impl


def pallas_interpret() -> bool:
    """Pallas kernels run in interpreter mode off-TPU (tests on CPU).

    VIP_PALLAS_FORCE_COMPILE=1 forces interpret=False regardless of the
    local backend so ``jax.export(..., platforms=['tpu'])`` exercises the
    real Pallas→Mosaic lowering on a CPU host — the only way to catch
    unsupported-primitive lowering errors without a chip
    (tests/test_tpu_lowering.py)."""
    import os
    if os.environ.get("VIP_PALLAS_FORCE_COMPILE"):
        return False
    return not on_tpu()

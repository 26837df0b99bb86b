"""CIEDE2000 squared color difference.

Counterpart of ``CIE_DeltaE2000_square`` (reference: include/cpp/slic.hpp:15-112)
— implemented there but never selectable (``distance_function_`` is fixed to
euclidean at :138).  Here it is a first-class optional SLIC metric,
vectorized for the VPU (branch-free via jnp.where).

Note the reference's ``degree_to_radian`` multiplies by π (not π/180,
include/cpp/slic.hpp:16-18) — a bug that rescales all the hue constants.  We
implement the *correct* CIEDE2000 here and document the divergence: the
reference path is unreachable anyway.  For strict API completeness the
π-scaled variant is ALSO provided (``ciede2000_ref_square``, SLIC metric
``"ciede2000_ref"``), parity-tested against the compiled reference function
via golden/ciede2000_ref.py (tests/test_ciede2000.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_POW25_7 = np.float32(6103515625.0)  # 25^7


def _deg(d):
    return np.float32(np.deg2rad(d))


def ciede2000_square(l1, a1, b1, l2, a2, b2):
    """Squared ΔE₀₀ between Lab pairs (arrays broadcast elementwise)."""
    l1 = jnp.asarray(l1, jnp.float32)
    a1 = jnp.asarray(a1, jnp.float32)
    b1 = jnp.asarray(b1, jnp.float32)
    l2 = jnp.asarray(l2, jnp.float32)
    a2 = jnp.asarray(a2, jnp.float32)
    b2 = jnp.asarray(b2, jnp.float32)

    c1 = jnp.sqrt(a1 * a1 + b1 * b1)
    c2 = jnp.sqrt(a2 * a2 + b2 * b2)
    bar_c = (c1 + c2) / 2.0
    bar_c7 = bar_c ** 7
    g = 0.5 * (1.0 - jnp.sqrt(bar_c7 / (bar_c7 + _POW25_7)))
    a1p = (1.0 + g) * a1
    a2p = (1.0 + g) * a2
    c1p = jnp.sqrt(a1p * a1p + b1 * b1)
    c2p = jnp.sqrt(a2p * a2p + b2 * b2)

    two_pi = np.float32(2 * np.pi)
    h1p = jnp.where((b1 == 0) & (a1p == 0), 0.0, jnp.arctan2(b1, a1p))
    h1p = jnp.where(h1p < 0, h1p + two_pi, h1p)
    h2p = jnp.where((b2 == 0) & (a2p == 0), 0.0, jnp.arctan2(b2, a2p))
    h2p = jnp.where(h2p < 0, h2p + two_pi, h2p)

    dl = l2 - l1
    dc = c2p - c1p
    prod = c1p * c2p
    dh = h2p - h1p
    dh = jnp.where(dh > np.pi, dh - two_pi, dh)
    dh = jnp.where(dh < -np.pi, dh + two_pi, dh)
    dh = jnp.where(prod == 0, 0.0, dh)
    dH = 2.0 * jnp.sqrt(prod) * jnp.sin(dh / 2.0)

    bar_l = (l1 + l2) / 2.0
    bar_cp = (c1p + c2p) / 2.0
    hsum = h1p + h2p
    habs = jnp.abs(h1p - h2p)
    bar_h = jnp.where(habs <= np.pi, hsum / 2.0,
                      jnp.where(hsum < two_pi, (hsum + two_pi) / 2.0,
                                (hsum - two_pi) / 2.0))
    bar_h = jnp.where(prod == 0, hsum, bar_h)

    t = (1.0 - 0.17 * jnp.cos(bar_h - _deg(30.0))
         + 0.24 * jnp.cos(2.0 * bar_h)
         + 0.32 * jnp.cos(3.0 * bar_h + _deg(6.0))
         - 0.20 * jnp.cos(4.0 * bar_h - _deg(63.0)))
    dtheta = _deg(30.0) * jnp.exp(-(((bar_h - _deg(275.0)) / _deg(25.0)) ** 2))
    bar_cp7 = bar_cp ** 7
    r_c = 2.0 * jnp.sqrt(bar_cp7 / (bar_cp7 + _POW25_7))
    s_l = 1.0 + (0.015 * (bar_l - 50.0) ** 2
                 / jnp.sqrt(20.0 + (bar_l - 50.0) ** 2))
    s_c = 1.0 + 0.045 * bar_cp
    s_h = 1.0 + 0.015 * bar_cp * t
    r_t = -jnp.sin(2.0 * dtheta) * r_c

    fl = dl / s_l
    fc = dc / s_c
    fh = dH / s_h
    return fl * fl + fc * fc + fh * fh + r_t * fc * fh


def _deg_ref(d):
    """The reference's degree_to_radian: degree * π (slic.hpp:16-18)."""
    return np.float32(np.float32(d) * np.float32(np.pi))


def ciede2000_ref_square(l1, a1, b1, l2, a2, b2):
    """Squared ΔE of the reference's π-SCALED CIE_DeltaE2000_square
    (include/cpp/slic.hpp:15-112) — its dead-code metric, twinned for API
    completeness.  Same branch structure as the C++, all f32 on device
    (the C++'s incidental per-expression double promotions are mirrored
    only in the golden NumPy twin, golden/ciede2000_ref.py; the f32-vs-
    mixed gap is bounded by tests/test_ciede2000.py).  NOT a perceptual
    metric — the 180× hue-constant rescale puts the cos/exp terms on
    essentially arbitrary phases; provided so a reference user flipping
    ``distance_function_`` finds the same behavior here."""
    l1 = jnp.asarray(l1, jnp.float32)
    a1 = jnp.asarray(a1, jnp.float32)
    b1 = jnp.asarray(b1, jnp.float32)
    l2 = jnp.asarray(l2, jnp.float32)
    a2 = jnp.asarray(a2, jnp.float32)
    b2 = jnp.asarray(b2, jnp.float32)
    full = _deg_ref(360.0)  # 360π — the wrap modulus the bug produces
    half = _deg_ref(180.0)

    c1 = jnp.sqrt(a1 * a1 + b1 * b1)
    c2 = jnp.sqrt(a2 * a2 + b2 * b2)
    bar_c = (c1 + c2) / 2.0
    bar_c7 = bar_c ** 7
    g = 0.5 * (1.0 - jnp.sqrt(bar_c7 / (bar_c7 + _POW25_7)))
    a1p = (1.0 + g) * a1
    a2p = (1.0 + g) * a2
    c1p = jnp.sqrt(a1p * a1p + b1 * b1)
    c2p = jnp.sqrt(a2p * a2p + b2 * b2)

    h1p = jnp.where((b1 == 0) & (a1p == 0), 0.0, jnp.arctan2(b1, a1p))
    h1p = jnp.where(h1p < 0, h1p + full, h1p)
    h2p = jnp.where((b2 == 0) & (a2p == 0), 0.0, jnp.arctan2(b2, a2p))
    h2p = jnp.where(h2p < 0, h2p + full, h2p)

    dl = l2 - l1
    dc = c2p - c1p
    prod = c1p * c2p
    dh = h2p - h1p
    dh = jnp.where(dh < -half, dh + full, dh)
    dh = jnp.where(dh > half, dh - full, dh)
    dh = jnp.where(prod == 0, 0.0, dh)
    dH = 2.0 * jnp.sqrt(prod) * jnp.sin(dh / 2.0)

    bar_l = (l1 + l2) / 2.0
    bar_cp = (c1p + c2p) / 2.0
    hsum = h1p + h2p
    habs = jnp.abs(h1p - h2p)
    bar_h = jnp.where(habs <= half, hsum / 2.0,
                      jnp.where(hsum < full, (hsum + full) / 2.0,
                                (hsum - full) / 2.0))
    bar_h = jnp.where(prod == 0, hsum, bar_h)

    t = (1.0 - 0.17 * jnp.cos(bar_h - _deg_ref(30.0))
         + 0.24 * jnp.cos(2.0 * bar_h)
         + 0.32 * jnp.cos(3.0 * bar_h + _deg_ref(6.0))
         - 0.20 * jnp.cos(4.0 * bar_h - _deg_ref(63.0)))
    dtheta = _deg_ref(30.0) * jnp.exp(
        -(((bar_h - _deg_ref(275.0)) / _deg_ref(25.0)) ** 2))
    bar_cp7 = bar_cp ** 7
    r_c = 2.0 * jnp.sqrt(bar_cp7 / (bar_cp7 + _POW25_7))
    s_l = 1.0 + (0.015 * (bar_l - 50.0) ** 2
                 / jnp.sqrt(20.0 + (bar_l - 50.0) ** 2))
    s_c = 1.0 + 0.045 * bar_cp
    s_h = 1.0 + 0.015 * bar_cp * t
    r_t = -jnp.sin(2.0 * dtheta) * r_c

    fl = dl / s_l
    fc = dc / s_c
    fh = dH / s_h
    return fl * fl + fc * fc + fh * fh + r_t * fc * fh

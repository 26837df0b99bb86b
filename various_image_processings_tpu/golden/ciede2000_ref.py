"""Golden twin of the reference's pi-scaled ``CIE_DeltaE2000_square``.

The reference implements CIEDE2000 for SLIC (include/cpp/slic.hpp:15-112)
but with ``degree_to_radian`` multiplying by pi instead of pi/180
(:16-18), which rescales every hue constant by 180x; the function is also
dead code there (``distance_function_`` is fixed to euclidean, :138).
core/ciede2000.py carries the *correct* metric; this module twins the
reference variant byte-for-byte in NumPy so even the dead code has a
tested counterpart (metric="ciede2000_ref").

Dtype fidelity: the C++ mixes float and double per expression —
``std::sqrt(int)``/``std::pow(double, int)``/``std::atan2(int, double)``
promote to double, while ``hPrime1/2``, ``deltahPrime``, ``barhPrime``
and ``hPrimeSum`` are *declared* float (each assignment rounds), and
``std::sin/cos(float)`` stay in float.  This twin mirrors every
promotion and narrowing.  The only unpinnable residue is libm sinf/cosf
vs NumPy's f32 trig (both correctly-rounded-ish, neither exactly; the
oracle test bounds the disagreement at ~1e-5 relative —
tests/test_ciede2000.py).
"""

from __future__ import annotations

import numpy as np

_PI_F = np.float32(np.pi)
_POW25_7 = np.float64(6103515625.0)  # the C++ constant is exact in f32 too


def _deg(d: float) -> np.float32:
    """degree_to_radian twin: degree * pi (f32), NOT pi/180 (slic.hpp:16-18)."""
    return np.float32(np.float32(d) * _PI_F)


def ciede2000_ref_square(l1, a1, b1, l2, a2, b2) -> np.ndarray:
    """Vectorized, dtype-exact twin of CIE_DeltaE2000_square (f32 result)."""
    l1 = np.asarray(l1, np.int64)
    a1 = np.asarray(a1, np.int64)
    b1 = np.asarray(b1, np.int64)
    l2 = np.asarray(l2, np.int64)
    a2 = np.asarray(a2, np.int64)
    b2 = np.asarray(b2, np.int64)
    f32, f64 = np.float32, np.float64
    deg360 = _deg(360.0)
    deg180 = _deg(180.0)

    # std::sqrt(int) -> double
    c1 = np.sqrt((a1 * a1 + b1 * b1).astype(f64))
    c2 = np.sqrt((a2 * a2 + b2 * b2).astype(f64))
    bar_c = (c1 + c2) / f64(2.0)  # double / 2.f promotes the literal
    bar_c7 = np.power(bar_c, f64(7.0))  # std::pow(double, int)
    g = f64(0.5) * (1.0 - np.sqrt(bar_c7 / (bar_c7 + _POW25_7)))
    a1p = (1.0 + g) * a1  # double
    a2p = (1.0 + g) * a2
    c1p = np.sqrt(a1p * a1p + b1 * b1)  # double
    c2p = np.sqrt(a2p * a2p + b2 * b2)

    # float hPrime1 = atan2(int, double): double atan2 NARROWED to f32,
    # then the <0 test and the +=deg360 happen in f32
    h1p = np.where((b1 == 0) & (a1p == 0), f32(0.0),
                   np.arctan2(b1.astype(f64), a1p).astype(f32))
    h1p = np.where(h1p < 0, (h1p + deg360).astype(f32), h1p).astype(f32)
    h2p = np.where((b2 == 0) & (a2p == 0), f32(0.0),
                   np.arctan2(b2.astype(f64), a2p).astype(f32))
    h2p = np.where(h2p < 0, (h2p + deg360).astype(f32), h2p).astype(f32)

    dl = (l2 - l1).astype(f64)  # int operand, promoted at use sites
    dc = c2p - c1p  # double
    prod = c1p * c2p  # double

    # float deltahPrime, wrap tests in f32 against the pi-scaled bounds
    dh = (h2p - h1p).astype(f32)
    dh = np.where(dh < -deg180, (dh + deg360).astype(f32), dh)
    dh = np.where(dh > deg180, (dh - deg360).astype(f32), dh)
    dh = np.where(prod == 0, f32(0.0), dh).astype(f32)
    # 2.f * sqrt(double) * sin(float): sinf stays f32, product is double
    dH = 2.0 * np.sqrt(prod) * np.sin((dh / f32(2.0)).astype(f32)).astype(f64)

    bar_l = ((l1 + l2).astype(f32) / f32(2.0)).astype(f32)  # (int)/2.f
    bar_cp = (c1p + c2p) / f64(2.0)  # double
    hsum = (h1p + h2p).astype(f32)  # float
    habs = np.abs((h1p - h2p).astype(f32))
    # float barhPrime; note the |..|<=180pi branch divides by 2.0 (double)
    # then narrows, the other branches divide by 2.f
    bar_h = np.where(
        habs <= deg180, (hsum.astype(f64) / 2.0).astype(f32),
        np.where(hsum < deg360, ((hsum + deg360).astype(f32) / f32(2.0)),
                 ((hsum - deg360).astype(f32) / f32(2.0)))).astype(f32)
    bar_h = np.where(prod == 0, hsum, bar_h).astype(f32)

    # T: leading 1.0 is double, each cos term is cosf(float) scaled by f32
    def cosf(x):
        return np.cos(np.asarray(x, f32)).astype(f32)

    t = (1.0
         - (f32(0.17) * cosf(bar_h - _deg(30.0))).astype(f64)
         + (f32(0.24) * cosf(f32(2.0) * bar_h)).astype(f64)
         + (f32(0.32) * cosf(f32(3.0) * bar_h + _deg(6.0))).astype(f64)
         - (f32(0.20) * cosf(f32(4.0) * bar_h - _deg(63.0))).astype(f64))
    # deltaTheta: the (barh-275pi)/25pi ratio is f32, std::pow(f32, 2.0)
    # and exp run in double, scaled by f32 30pi -> double
    ratio = ((bar_h - _deg(275.0)).astype(f32) / _deg(25.0)).astype(f32)
    dtheta = _deg(30.0) * np.exp(-np.power(ratio.astype(f64), 2.0))
    bar_cp7 = np.power(bar_cp, f64(7.0))
    r_c = 2.0 * np.sqrt(bar_cp7 / (bar_cp7 + _POW25_7))  # double
    # S_L is pure f32: SQUARE(barLPrime-50.f), 20+f32, sqrtf, 1+f32
    sq = ((bar_l - f32(50.0)) * (bar_l - f32(50.0))).astype(f32)
    s_l = (f32(1.0) + ((f32(0.015) * sq).astype(f32)
                       / np.sqrt((f32(20.0) + sq).astype(f32)).astype(f32))
           ).astype(f32)
    s_c = 1.0 + f64(0.045) * bar_cp  # double
    s_h = 1.0 + f64(0.015) * bar_cp * t  # double
    r_t = -np.sin(2.0 * dtheta) * r_c  # double (dtheta is double)

    # deltaLPrime/(k_L*S_L) is int/float -> f32, squared in f32; the other
    # two quotients and the cross term are double; the sum promotes
    fl = (dl.astype(f32) / s_l).astype(f32)
    fl2 = (fl * fl).astype(f32).astype(f64)
    fc = dc / s_c
    fh = dH / s_h
    de = fl2 + fc * fc + fh * fh + r_t * fc * fh
    return de.astype(f32)  # the function returns float

"""Double-word f32 ("compensated") arithmetic for TPU kernels.

Why this exists (round-5 VERDICT item 1): the mixed path's f64 residual
element pass is pure XLA — Pallas is f32-only on this platform — and its
slice/pad graph fragments exactly like the f32 one did before the fused
kernels, costing 45 ms of a ~61 ms Newton step at 1M DOF (round-4 TPU
breakdown). SURVEY.md §9 risk 5 anticipated the bridge: represent each
f64 value as an UNEVALUATED PAIR of f32 (hi, lo) with |lo| <= ulp(hi)/2
and do the element pass in double-word arithmetic inside a fused Pallas
kernel. A double-word f32 has an effective 48-bit significand (~3.6e-15
relative per operation) — far below the 1e-13 agreement bar the VERDICT
set and the ~1e-10 the Newton forcing sequence actually needs; the pure
f64 XLA pass remains the parity/convergence authority
(solvers/newton._residual_soa_fn).

Algorithms are the classical error-free transformations (Dekker 1971,
Knuth TAOCP v2) and the double-word operations of Joldes, Muller &
Popescu, "Tight and rigorous error bounds for basic building blocks of
double-word arithmetic" (ACM TOMS 2017) in their no-FMA forms — TPUs
expose no scalar FMA through XLA/Mosaic, so products use Dekker
splitting (exact 12+12-bit factorization of the 24-bit significand).
Everything here is dtype-generic elementwise jnp code: it runs identically
inside Pallas kernel bodies (Mosaic), under jit on any backend, and on
numpy inputs via jnp — which is how the unit tests pin each operation
against f64 (tests/test_dfloat.py).

A double-word value is a plain tuple (hi, lo) — pytree-friendly, usable
as Pallas kernel operands. Constants (geometry tables, material
parameters, series coefficients) are pre-split on the host with
`const_split` so kernels bake them as compile-time scalars.

IMPORTANT numerical contract: none of these identities survive value-
changing float rewrites (reassociation, x+y-x -> y). XLA and Mosaic do
not perform such rewrites on f32 (only NaN-propagation-relaxed min/max
and a*b+c contraction, which Dekker splitting is immune to by
construction: split products are exact in ONE f32 multiply).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

# 2^12 + 1: Dekker splitter for the 24-bit f32 significand (12 + 12)
_SPLITTER = 4097.0


def two_sum(a, b):
    """Knuth: s + e == a + b exactly, s = fl(a + b)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Dekker: requires |a| >= |b| (or a == 0); s + e == a + b exactly."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """Dekker split: a == h + l with h, l each having <= 12 significant
    bits (so any h*h', h*l', l*l' product is EXACT in f32)."""
    c = _SPLITTER * a
    h = c - (c - a)
    return h, a - h


def two_prod(a, b, a_sp=None, b_sp=None):
    """p + e == a * b exactly, p = fl(a * b). Pass precomputed Dekker
    splits to amortize them across products sharing a factor."""
    p = a * b
    ah, al = a_sp if a_sp is not None else split(a)
    bh, bl = b_sp if b_sp is not None else split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ---------------------------------------------------------------------------
# double-word numbers: plain (hi, lo) tuples
# ---------------------------------------------------------------------------


class Const(NamedTuple):
    """A pre-split compile-time double-word constant: value == hi + lo in
    f64, with (hh, hl) the Dekker split of hi (all Python floats exactly
    representable in f32 — Mosaic folds them into the kernel)."""

    hi: float
    lo: float
    hh: float
    hl: float


def const_split(x: float) -> Const:
    """Host-side: f64 value -> pre-split double-word f32 constant."""
    import numpy as np

    hi = float(np.float32(x))
    lo = float(np.float32(x - hi))
    c = float(np.float32(_SPLITTER * np.float32(hi)))
    hh = float(np.float32(c - np.float32(c - np.float32(hi))))
    hl = float(np.float32(np.float32(hi) - hh))
    return Const(hi, lo, hh, hl)


def from_f64(x, dtype=jnp.float32):
    """f64 array -> (hi, lo) pair of `dtype` arrays (XLA-side)."""
    hi = x.astype(dtype)
    lo = (x - hi.astype(x.dtype)).astype(dtype)
    return hi, lo


def to_f64(d):
    """(hi, lo) -> f64 array (exact: f64 absorbs both words)."""
    return d[0].astype(jnp.float64) + d[1].astype(jnp.float64)


def wrap(hi):
    """Plain f32 value -> double-word with zero low part."""
    return hi, jnp.zeros_like(hi)


def neg(x):
    return -x[0], -x[1]


def add(x, y):
    """AccurateDWPlusDW (Joldes et al. alg. 6): rel error <= 3u^2 + 13u^3
    even under full cancellation."""
    sh, sl = two_sum(x[0], y[0])
    th, tl = two_sum(x[1], y[1])
    vh, vl = fast_two_sum(sh, sl + th)
    return fast_two_sum(vh, tl + vl)


def sub(x, y):
    return add(x, neg(y))


def add_f32(x, b):
    """DWPlusFP (alg. 4): rel error <= 2u^2."""
    sh, sl = two_sum(x[0], b)
    return fast_two_sum(sh, x[1] + sl)


def mul(x, y, x_sp=None, y_sp=None):
    """DWTimesDW without FMA (alg. 12 form): rel error ~5u^2."""
    ph, pl = two_prod(x[0], y[0], x_sp, y_sp)
    pl = pl + (x[0] * y[1] + x[1] * y[0])
    return fast_two_sum(ph, pl)


def mul_f32(x, b, b_sp=None):
    """DWTimesFP (alg. 9 form): rel error ~3u^2."""
    ph, pl = two_prod(x[0], b, None, b_sp)
    return fast_two_sum(ph, pl + x[1] * b)


def mul_const(x, c: Const):
    """x * c with a pre-split double-word constant."""
    ph, pl = two_prod(x[0], c.hi, None, (c.hh, c.hl))
    pl = pl + (x[0] * c.lo + x[1] * c.hi)
    return fast_two_sum(ph, pl)


def div(x, y):
    """DWDivDW via one refined f32 quotient: q = fl(xh/yh), exact residual
    r = x - y*q (Sterbenz: xh - fl(yh*q) is exact since they agree to
    ~2^-24), correction r_hi/yh. Rel error ~u^2."""
    q0 = x[0] / y[0]
    ph, pl = two_prod(y[0], q0)
    r = (((x[0] - ph) - pl) + x[1]) - y[1] * q0
    return fast_two_sum(q0, r / y[0])


def recip(y):
    """1 / y, same refinement as `div`."""
    q0 = 1.0 / y[0]
    ph, pl = two_prod(y[0], q0)
    e = ((1.0 - ph) - pl) - y[1] * q0
    return fast_two_sum(q0, q0 * e)


def sqrt(x):
    """sqrt(x) for x > 0: y0 = fl(sqrt(xh)), exact residual x - y0^2,
    one Newton correction. Rel error ~u^2 (~2^-49)."""
    y0 = jnp.sqrt(x[0])
    ph, pl = two_prod(y0, y0)
    r = ((x[0] - ph) - pl) + x[1]
    return fast_two_sum(y0, r / (y0 + y0))


# atanh-series coefficients 1/(2k+1) as pre-split constants (k = 0..9):
# |s| <= 0.2 after reduction, truncation 2*0.2^21/21 ~ 2e-16
_LOG_TERMS = 10
_LOG_COEFFS = tuple(const_split(1.0 / (2 * k + 1)) for k in range(_LOG_TERMS))
_LN2 = const_split(math.log(2.0))


def log(x):
    """log(x) for x > 0, absolute error ~1e-14 over the normal-f32 range
    (measured in tests/test_dfloat.py; near x = 1 the error scales with
    |log x| — full double-word precision, no cancellation).

    Range reduction is frexp by integer bit ops (Mosaic lowers f32<->i32
    bitcasts and shifts to plain vector ops — the same machinery its PRNG
    kernels use): x = 2^e * m with m in [2/3, 4/3], then the atanh series

        log(x) = e*ln2 + 2*atanh(s),  s = (m-1)/(m+1), |s| <= 0.2.

    A sqrt-chain reduction was rejected: each df sqrt's ~2^-49 relative
    error is amplified 2^k by the chain, flooring the result at ~1e-13.
    x <= 0 or non-finite returns NaN (mirrors the f64 element pass, whose
    NaN poisons the Newton state and routes the increment to bisection)."""
    import jax.lax as lax

    xh, xl = x
    i = lax.bitcast_convert_type(xh, jnp.int32)
    c23 = jnp.int32(23)
    e = lax.shift_right_logical(i, c23) - jnp.int32(127)  # x > 0: sign clear
    m = lax.bitcast_convert_type(
        (i & jnp.int32(0x007FFFFF)) | jnp.int32(0x3F800000), jnp.float32
    )
    big = m > (4.0 / 3.0)
    m = jnp.where(big, 0.5 * m, m)  # exact
    e = jnp.where(big, e + jnp.int32(1), e)
    # exact 2^-e as a float, to rescale the low word onto m's binade
    inv2e = lax.bitcast_convert_type(
        lax.shift_left(jnp.int32(127) - e, c23), jnp.float32
    )
    M = (m, xl * inv2e)
    s = div(add_f32(M, -1.0), add_f32(M, 1.0))
    s2 = mul(s, s)
    acc = (
        jnp.full_like(m, _LOG_COEFFS[-1].hi),
        jnp.full_like(m, _LOG_COEFFS[-1].lo),
    )
    for c in reversed(_LOG_COEFFS[:-1]):
        t = mul(acc, s2)
        # sloppy DWPlusDW is safe here: t and the coefficient are both
        # positive (s2 >= 0, all coefficients > 0) — no cancellation
        sh, se = two_sum(t[0], c.hi)
        acc = fast_two_sum(sh, se + (t[1] + c.lo))
    r = mul(acc, s)
    out = add((r[0] + r[0], r[1] + r[1]), mul_const(wrap(e.astype(xh.dtype)), _LN2))
    bad = ~(xh > 0.0) | ~jnp.isfinite(xh)
    nan = jnp.float32(jnp.nan)
    return jnp.where(bad, nan, out[0]), jnp.where(bad, nan, out[1])


class Acc:
    """Compensated accumulator for dot-product-like sums of double-words:
    hi parts via two_sum, all compensation terms in plain f32 (their own
    rounding is O(u^2) relative to the sum of magnitudes)."""

    __slots__ = ("s", "c")

    def __init__(self, init=None):
        self.s = 0.0 if init is None else init
        self.c = 0.0

    def add(self, x):
        s, e = two_sum(self.s, x[0])
        self.s = s
        self.c = self.c + (e + x[1])
        return self

    def to_df(self):
        return fast_two_sum(self.s, self.c)


def table_const(value: float) -> Const:
    """Alias of const_split for call-site clarity when baking geometry."""
    return const_split(value)


def math_ulp_check():  # pragma: no cover - debugging helper
    """Smoke check that the splitter constant matches the f32 format."""
    assert _SPLITTER == 2.0**12 + 1
    assert math.ldexp(1.0, -23) == 2.0**-23

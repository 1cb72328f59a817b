"""Unit battery for double-word f32 arithmetic (ops/dfloat.py).

Each operation is pinned against f64 over ranges the residual kernel
actually sees (detC in ~[1e-2, 1e2], displacements/forces O(1e-3..1e3)).
References are computed from the EXACTLY REPRESENTED inputs
(to_f64(hi, lo)) so the bounds measure the operations themselves, not the
~2^-48 representation error of converting an arbitrary f64. The
contract: relative error per operation well below 1e-13 — two orders
under the f64-agreement bar of the compensated residual pass
(round-5 VERDICT item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fea_large_tpu.ops import dfloat as df

jax.config.update("jax_enable_x64", True)


def _pairs(rng, n, scale=1.0):
    """Random double-word values; returns (represented f64, (hi, lo))."""
    x64 = jnp.asarray((rng.standard_normal(n) * scale))
    d = df.from_f64(x64)
    return df.to_f64(d), d


def _rel(err, ref):
    return np.max(
        np.abs(np.asarray(err)) / np.maximum(np.abs(np.asarray(ref)), 1e-300)
    )


RNG = np.random.default_rng(0)
N = 4096


def test_from_f64_representation():
    x64 = jnp.asarray(RNG.standard_normal(N) * 3.7)
    d = df.from_f64(x64)
    assert _rel(df.to_f64(d) - x64, x64) < 2**-47
    # double-word invariant: |lo| <= ulp(hi)/2
    assert np.all(np.abs(np.asarray(d[1])) <= np.spacing(np.abs(np.asarray(d[0], np.float32))))


def test_two_sum_exact():
    a = jnp.asarray(RNG.standard_normal(N), jnp.float32)
    b = jnp.asarray(RNG.standard_normal(N) * 1e-5, jnp.float32)
    s, e = df.two_sum(a, b)
    exact = a.astype(jnp.float64) + b.astype(jnp.float64)
    got = s.astype(jnp.float64) + e.astype(jnp.float64)
    assert np.array_equal(np.asarray(exact), np.asarray(got))


def test_two_prod_exact():
    a = jnp.asarray(RNG.standard_normal(N), jnp.float32)
    b = jnp.asarray(RNG.standard_normal(N), jnp.float32)
    p, e = df.two_prod(a, b)
    exact = a.astype(jnp.float64) * b.astype(jnp.float64)
    got = p.astype(jnp.float64) + e.astype(jnp.float64)
    assert np.array_equal(np.asarray(exact), np.asarray(got))


@pytest.mark.parametrize("scale", [1.0, 1e3, 1e-3])
def test_add_sub_mul(scale):
    x64, x = _pairs(RNG, N, scale)
    y64, y = _pairs(RNG, N, scale)
    # accurate DWPlusDW: relative error ~3u^2 OF THE RESULT, even under
    # the cancellation a random sum produces
    assert _rel(df.to_f64(df.add(x, y)) - (x64 + y64), x64 + y64) < 1e-13
    assert _rel(df.to_f64(df.sub(x, y)) - (x64 - y64), x64 - y64) < 1e-13
    assert _rel(df.to_f64(df.mul(x, y)) - x64 * y64, x64 * y64) < 1e-13


def test_add_full_cancellation():
    # x + (-x + tiny): the accurate DWPlusDW keeps full relative accuracy
    # of the ~1e-9 result. The reference must be grouped (hi+hi)+(lo+lo):
    # a naive f64 (xh+xl)+(yh+yl) itself rounds at 2^-53*|x| >> result.
    x64, x = _pairs(RNG, N, 1.0)
    tiny = jnp.asarray(RNG.standard_normal(N) * 1e-9, jnp.float32)
    y = df.add_f32(df.neg(x), tiny)
    out = df.to_f64(df.add(x, y))
    f64 = lambda a: a.astype(jnp.float64)  # noqa: E731
    ref = (f64(x[0]) + f64(y[0])) + (f64(x[1]) + f64(y[1]))
    assert _rel(out - ref, ref) < 1e-9


def test_div_recip_sqrt():
    x64, x = _pairs(RNG, N, 2.0)
    y64raw = jnp.abs(jnp.asarray(RNG.standard_normal(N))) + 0.1
    y = df.from_f64(y64raw)
    y64 = df.to_f64(y)
    assert _rel(df.to_f64(df.div(x, y)) - x64 / y64, x64 / y64) < 1e-13
    assert _rel(df.to_f64(df.recip(y)) - 1.0 / y64, 1.0 / y64) < 1e-13
    assert _rel(df.to_f64(df.sqrt(y)) - jnp.sqrt(y64), jnp.sqrt(y64)) < 1e-13


@pytest.mark.parametrize("lo_r, hi_r", [(0.5, 2.0), (0.01, 100.0), (1e-6, 1e6)])
def test_log(lo_r, hi_r):
    v64raw = jnp.asarray(np.exp(RNG.uniform(np.log(lo_r), np.log(hi_r), N)))
    v = df.from_f64(v64raw)
    v64 = df.to_f64(v)
    got = df.to_f64(df.log(v))
    ref = jnp.log(v64)
    # error ~2u^2 relative to |log x| (the final add's rounding); the
    # residual kernel's detC lives in ~[1e-2, 1e2] where this is <4e-14
    # absolute — well under the 1e-13 agreement bar (VERDICT item 1)
    bound = 1e-14 + 1e-14 * np.abs(np.asarray(ref))
    assert np.all(np.abs(np.asarray(got - ref)) < bound)


def test_log_near_one():
    # log1p-cancellation regime: detC ~ 1 + 1e-6. The frexp reduction
    # keeps FULL double-word precision here (e = 0, s ~ eps/2): the error
    # scales with |log|, not with a fixed absolute floor
    eps = jnp.asarray(RNG.uniform(-1e-6, 1e-6, N))
    v = df.from_f64(1.0 + eps)
    v64 = df.to_f64(v)
    got = df.to_f64(df.log(v))
    ref = jnp.log(v64)
    assert np.max(np.abs(np.asarray(got - ref))) < 2e-20


def test_log_nonpositive_is_nan():
    v = (jnp.asarray([-1.0, 0.0, 2.0], jnp.float32), jnp.zeros(3, jnp.float32))
    out = df.to_f64(df.log(v))
    assert np.isnan(out[0]) and np.isnan(out[1]) and np.isfinite(out[2])


def test_mul_const():
    x64, x = _pairs(RNG, N, 1.0)
    c64 = 0.123456789123456789
    c = df.const_split(c64)
    assert abs((c.hi + c.lo) - c64) < 1e-14 * abs(c64)
    assert c.hh + c.hl == np.float32(c.hi)
    got = df.to_f64(df.mul_const(x, c))
    ref = x64 * (c.hi + c.lo)
    assert _rel(got - ref, ref) < 1e-13


def test_acc_dot_product():
    # a cancellation-heavy compensated sum: +/- pairs with a small
    # perturbation; plain f32 loses everything, Acc keeps ~1e-13
    rng = np.random.default_rng(7)
    refs = []
    acc = df.Acc()
    for k in range(24):
        t64, t = _pairs(rng, N, 1.0)
        if k % 2:
            t64, t = -t64, df.neg(t)
        t = df.add_f32(t, jnp.float32(1e-8))
        refs.append(df.to_f64(t))
        acc.add(t)
    ref = sum(refs[1:], refs[0])
    got = df.to_f64(acc.to_df())
    # abs error ~ 1.5e-14 * sum|terms| (compensation terms round in f32)
    assert np.max(np.abs(np.asarray(got - ref))) < 24 * 3e-14


def test_ops_accurate_under_jit():
    # the identities must survive jit (XLA may contract a*b+c into fma,
    # which Dekker splitting tolerates; value-changing reassociation
    # would break them — this guards against that ever appearing)
    x64, x = _pairs(RNG, N, 1.0)
    y64raw = jnp.abs(jnp.asarray(RNG.standard_normal(N))) + 0.5
    y = df.from_f64(y64raw)
    y64 = df.to_f64(y)

    def f(xh, xl, yh, yl):
        a = df.mul((xh, xl), (yh, yl))
        b = df.add(a, df.sqrt((yh, yl)))
        return df.log(df.add_f32(df.mul(b, b), 3.0))

    ref_in = (x64 * y64 + jnp.sqrt(y64)) ** 2 + 3.0
    ref = jnp.log(ref_in)
    jitted = df.to_f64(jax.jit(f)(x[0], x[1], y[0], y[1]))
    assert _rel(jitted - ref, ref) < 1e-12

"""Grisu2 double→string (dtoa_milo behavior) in pure Python.

The reference renders every JSON number through Milo Yip's Grisu2
implementation (vendored as milo/dtoa_milo.h; algorithm published in
Loitsch, "Printing Floating-Point Numbers Quickly and Accurately with
Integers", PLDI 2010).  Grisu2 is NOT always shortest-round-trip — e.g.
the double nearest -122.293450 prints as -122.29345000000001 — so
byte-exact parity with the reference's decode/jsontool output needs the
same algorithm, not Python's repr().

This is an independent implementation from the published algorithm:
64-bit DiyFp arithmetic on Python ints (masked to 64 bits where C would
wrap), cached powers of 10 computed exactly with big-int division
instead of a table, and the same digit-generation/rounding/prettify
rules (JavaScript-style formatting ranges)."""

from __future__ import annotations

import math
import struct
from functools import lru_cache

_M64 = (1 << 64) - 1
_HIDDEN = 1 << 52
_EXP_BIAS = 0x3FF + 52  # kDpExponentBias


def _decompose(d: float) -> tuple[int, int]:
    u = struct.unpack("<Q", struct.pack("<d", d))[0]
    biased_e = (u >> 52) & 0x7FF
    significand = u & (_HIDDEN - 1)
    if biased_e != 0:
        return significand + _HIDDEN, biased_e - _EXP_BIAS
    return significand, -_EXP_BIAS + 1


def _normalize(f: int, e: int) -> tuple[int, int]:
    while not (f & (1 << 63)):
        f <<= 1
        e -= 1
    return f, e


def _mult(a: tuple[int, int], b: tuple[int, int]) -> tuple[int, int]:
    # round-nearest 64x64→64 high product (DiyFp::operator*)
    h = ((a[0] * b[0]) + (1 << 63)) >> 64
    return h & _M64, a[1] + b[1] + 64


@lru_cache(maxsize=None)
def _pow10_diy(k: int) -> tuple[int, int]:
    """10^k as (f, e) with 2^63 <= f < 2^64, f = round(10^k / 2^e)."""
    if k >= 0:
        num, den = 10**k, 1
    else:
        num, den = 1, 10 ** (-k)
    e = num.bit_length() - den.bit_length() - 64
    while True:
        if e >= 0:
            q, r = divmod(num, den << e)
            half = (den << e)
        else:
            q, r = divmod(num << (-e), den)
            half = den
        # round half away from zero (positive values)
        if 2 * r >= half:
            q += 1
        if q >> 64:
            e += 1
            continue
        if not (q >> 63):
            e -= 1
            continue
        return q, e


def _cached_power(e: int) -> tuple[int, int, int]:
    """Cached 10^k selection (alpha=-60..gamma=-32 window): same index
    arithmetic as the reference, powers computed exactly."""
    dk = (-61 - e) * 0.30102999566398114 + 347
    k = int(dk)
    if k != dk:
        k += 1
    index = (k >> 3) + 1
    K = -(-348 + (index << 3))
    f, ce = _pow10_diy(-K)
    return f, ce, K


def _grisu_round(buffer: list[str], delta: int, rest: int,
                 ten_kappa: int, wp_w: int) -> None:
    while (
        rest < wp_w
        and delta - rest >= ten_kappa
        and (rest + ten_kappa < wp_w or wp_w - rest > rest + ten_kappa - wp_w)
    ):
        buffer[-1] = chr(ord(buffer[-1]) - 1)
        rest += ten_kappa


_POW10 = (1, 10, 100, 1000, 10000, 100000, 1000000,
          10000000, 100000000, 1000000000)


def _digit_gen(W, Mp, delta: int) -> tuple[list[str], int]:
    one_e = Mp[1]
    one_f = 1 << -one_e
    wp_w = (Mp[0] - W[0]) & _M64
    p1 = Mp[0] >> -one_e
    p2 = Mp[0] & (one_f - 1)
    kappa = len(str(p1))
    buffer: list[str] = []
    K = 0

    while kappa > 0:
        div = _POW10[kappa - 1]
        d, p1 = divmod(p1, div)
        if d or buffer:
            buffer.append(chr(ord("0") + d))
        kappa -= 1
        tmp = (p1 << -one_e) + p2
        if tmp <= delta:
            K += kappa
            _grisu_round(buffer, delta, tmp, _POW10[kappa] << -one_e, wp_w)
            return buffer, K

    while True:
        p2 = (p2 * 10) & _M64
        delta = (delta * 10) & _M64
        d = p2 >> -one_e
        if d or buffer:
            buffer.append(chr(ord("0") + d))
        p2 &= one_f - 1
        kappa -= 1
        if p2 < delta:
            K += kappa
            idx = -kappa
            _grisu_round(
                buffer, delta, p2, one_f,
                (wp_w * (_POW10[idx] if idx < 9 else 0)) & _M64,
            )
            return buffer, K


def _grisu2(value: float) -> tuple[list[str], int]:
    f, e = _decompose(value)
    # normalized boundaries
    pl_f, pl_e = _normalize((f << 1) + 1, e - 1)
    if f == _HIDDEN:
        mi_f, mi_e = (f << 2) - 1, e - 2
    else:
        mi_f, mi_e = (f << 1) - 1, e - 1
    mi_f <<= mi_e - pl_e
    mi_e = pl_e
    c_f, c_e, K = _cached_power(pl_e)
    W = _mult(_normalize(f, e), (c_f, c_e))
    Wp = _mult((pl_f, pl_e), (c_f, c_e))
    Wm = _mult((mi_f, mi_e), (c_f, c_e))
    wm_f = (Wm[0] + 1) & _M64
    wp_f = (Wp[0] - 1) & _M64
    buffer, K2 = _digit_gen(W, (wp_f, Wp[1]), (wp_f - wm_f) & _M64)
    return buffer, K + K2


def _write_exponent(k: int) -> str:
    sign = "-" if k < 0 else "+"
    return sign + str(abs(k))


def _prettify(digits: list[str], K: int) -> str:
    length = len(digits)
    kk = length + K  # 10^(kk-1) <= v < 10^kk
    if length <= kk <= 21:
        return "".join(digits) + "0" * (kk - length)
    if 0 < kk <= 21:
        return "".join(digits[:kk]) + "." + "".join(digits[kk:])
    if -6 < kk <= 0:
        return "0." + "0" * (-kk) + "".join(digits)
    if length == 1:
        return digits[0] + "e" + _write_exponent(kk - 1)
    return digits[0] + "." + "".join(digits[1:]) + "e" + _write_exponent(kk - 1)


def dtoa_milo(value: float) -> str:
    """Byte-faithful dtoa_milo: nan/inf names, "0", Grisu2 + prettify."""
    if math.isnan(value):
        return "nan"
    if math.isinf(value):
        return "-inf" if value < 0 else "inf"
    if value == 0:
        return "0"
    minus = value < 0
    if minus:
        value = -value
    digits, K = _grisu2(value)
    s = _prettify(digits, K)
    return "-" + s if minus else s

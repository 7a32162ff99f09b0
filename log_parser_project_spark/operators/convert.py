"""Type-conversion operators: bit slicing and IEEE-754 reinterpret.

The reference's decode core is bit-granular field extraction from
little-endian payloads (``hex_decoder_module/utils/byte_ops.py:31-66``
``slice_bits``) plus raw-bits→float reinterpretation
(``utils/type_converters.py:144-183`` via ``struct.unpack('<f')``).
Here the analogs are:

* :func:`slice_bits` — pure column expression (shift + mask), stays in
  whole-stage codegen (F4);
* :func:`f32_from_bits` — Arrow-batched pandas UDF using numpy's
  zero-copy ``view``; Spark has no built-in bit-reinterpret (F6).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def slice_bits(col: Column, offset_bits: int, length_bits: int) -> Column:
    """Unsigned bit-field ``[offset, offset+length)`` of an integer
    column — the expression analog of ``byte_ops.slice_bits`` (shift
    right, mask); arbitrary widths up to 63 bits."""
    if not 0 < length_bits < 64:
        raise ValueError("length_bits must be in [1, 63]")
    mask = (1 << length_bits) - 1
    return F.shiftright(col.cast("long"), offset_bits).bitwiseAND(F.lit(mask))


@pandas_udf(T.DoubleType())
def f32_from_bits(bits: pd.Series) -> pd.Series:
    """Reinterpret a uint32 bit pattern as an IEEE-754 float32
    (vectorized ``np.view`` — the batched analog of
    ``struct.unpack('<f')``), widened losslessly to double."""
    import numpy as np

    a = bits.to_numpy(dtype="int64").astype("uint32")
    return pd.Series(a.view("float32").astype("float64"))


@pandas_udf(T.DoubleType())
def f64_from_bits(bits: pd.Series) -> pd.Series:
    """Reinterpret an int64 bit pattern as an IEEE-754 float64 (the
    ``struct.unpack('<d')`` analog; the long already carries all 64
    bits, sign bit included).

    Caveat shared with :func:`f32_from_bits`: pandas→Arrow uses NaN as
    the null sentinel, so a NaN bit pattern surfaces as NULL through
    the UDF path. The expression variants (:func:`f32_from_bits_expr`,
    :func:`f64_from_parts`) preserve NaN and are what the hex decode
    path wires in."""
    import numpy as np

    a = bits.to_numpy(dtype="int64")
    return pd.Series(a.view("float64"))


def _ieee754_value(sign: Column, exp: Column, frac: Column,
                   exp_bits: int, frac_bits: int) -> Column:
    """(sign, biased exponent, fraction) → double, expression-only.

    Every step is exact in binary64: ``frac · 2^-frac_bits`` divides by
    a power of two, ``1 + f`` with f ∈ [0,1) fits a 53-bit significand,
    and scaling by ``2^(e-bias)`` multiplies by a power of two — so the
    result is bit-identical to a hardware reinterpret (float32 widens
    losslessly; float64 is the definition itself). Asserted against the
    ``np.view`` UDFs over random bit patterns in tests."""
    bias = (1 << (exp_bits - 1)) - 1
    max_exp = (1 << exp_bits) - 1
    sgn = F.when(sign == 1, F.lit(-1.0)).otherwise(F.lit(1.0))
    normal = (
        sgn
        * (F.lit(1.0) + frac.cast("double") * F.lit(2.0 ** -frac_bits))
        * F.pow(F.lit(2.0), (exp - bias).cast("double"))
    )
    subnormal = sgn * frac.cast("double") * F.lit(2.0 ** (1 - bias - frac_bits))
    inf_or_nan = F.when(frac == 0, sgn * F.lit(float("inf"))).otherwise(F.lit(float("nan")))
    return (
        F.when(exp == max_exp, inf_or_nan)
        .when(exp == 0, subnormal)
        .otherwise(normal)
    )


def f32_from_bits_expr(raw: Column) -> Column:
    """Expression-only float32 reinterpret of a uint32 bit pattern held
    in a long — stays in whole-stage codegen, unlike the UDF variant
    (reference ``utils/type_converters.py:144-183`` decode_float)."""
    sign = F.shiftright(raw, 31).bitwiseAND(F.lit(1))
    exp = F.shiftright(raw, 23).bitwiseAND(F.lit(0xFF))
    frac = raw.bitwiseAND(F.lit((1 << 23) - 1))
    return _ieee754_value(sign, exp, frac, 8, 23)


def f64_from_parts(hi: Column, lo: Column) -> Column:
    """Expression-only float64 reinterpret from its two little-endian
    32-bit halves (hi = bytes 4-7, lo = bytes 0-3). Working in halves
    keeps every intermediate inside a *signed* long — assembling the
    full word would overflow when the sign bit is set (``conv`` returns
    the unsigned decimal string, and casting 2^63.. to long nulls)."""
    sign = F.shiftright(hi, 31).bitwiseAND(F.lit(1))
    exp = F.shiftright(hi, 20).bitwiseAND(F.lit(0x7FF))
    frac = hi.bitwiseAND(F.lit((1 << 20) - 1)) * F.lit(1 << 32) + lo
    return _ieee754_value(sign, exp, frac, 11, 52)

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

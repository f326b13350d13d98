"""Hash expressions.

``finite_axpb`` — the GF(2^64) affine hash ``(a ⊗ x) ⊕ b`` with carry-less
multiplication modulo the primitive polynomial x^64 + x^4 + x^3 + x + 1,
matching reference src/expressions/finite_axpb.rs:17-34. Exposed as a
vectorized pandas UDF over numpy uint64 bit ops (null-propagating,
deterministic). The production WCC path uses Spark's built-in ``xxhash64``
instead (see operators/connected_components.py); this UDF exists for
surface parity and for anyone porting reference pipelines verbatim.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def gf2_64_mul(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Carry-less multiply of uint64 arrays, reduced mod x^64+x^4+x^3+x+1."""
    a = a.astype(np.uint64, copy=False)
    x = x.astype(np.uint64, copy=False)
    lo = np.zeros_like(x)
    hi = np.zeros_like(x)
    one = np.uint64(1)
    for i in range(64):
        bit = (a >> np.uint64(i)) & one
        mask = (~(bit - one)).astype(np.uint64)  # all-ones where bit set
        lo ^= (x << np.uint64(i)) & mask
        if i > 0:
            hi ^= (x >> np.uint64(64 - i)) & mask
    # reduce: x^64 ≡ x^4 + x^3 + x + 1 (fold twice; second fold's overflow
    # is at most 4 bits, which a third fold of zero handles implicitly)
    for _ in range(2):
        new_hi = (hi >> np.uint64(60)) ^ (hi >> np.uint64(61)) ^ (hi >> np.uint64(63))
        lo ^= (hi << np.uint64(4)) ^ (hi << np.uint64(3)) ^ (hi << np.uint64(1)) ^ hi
        hi = new_hi
    return lo


def gf2_64_axpb(a: np.ndarray, x: np.ndarray, b: np.ndarray) -> np.ndarray:
    return gf2_64_mul(a, x) ^ b.astype(np.uint64, copy=False)


def _axpb_pandas(a: pd.Series, x: pd.Series, b: pd.Series) -> pd.Series:
    mask = a.isna() | x.isna() | b.isna()
    av = a.fillna(0).to_numpy(dtype=np.int64).view(np.uint64)
    xv = x.fillna(0).to_numpy(dtype=np.int64).view(np.uint64)
    bv = b.fillna(0).to_numpy(dtype=np.int64).view(np.uint64)
    out = pd.Series(gf2_64_axpb(av, xv, bv).view(np.int64))
    out[mask.to_numpy()] = None
    return out


_finite_axpb_udf = None


def finite_axpb(a: Column, x: Column, b: Column) -> Column:
    """Column expression: (a ⊗ x) ⊕ b over GF(2^64); null-propagating."""
    global _finite_axpb_udf
    if _finite_axpb_udf is None:
        _finite_axpb_udf = F.pandas_udf(_axpb_pandas, LongType())
    return _finite_axpb_udf(a, x, b)

"""Multi-dimensional chunk clustering (Z-order).

Range chunking on ONE column gives tight min/max stats for that column
only; interleaving the bits of two sort dimensions (Morton / Z-order —
standard public technique, used by Delta/Iceberg OPTIMIZE ZORDER)
clusters chunks so manifest min/max pruning is selective on EITHER
column. The expression is pure Spark built-ins (shiftright/shiftleft/
bitwiseAND chains — whole-stage codegen, no Python), usable directly as
``write_table(chunk_expr=zorder_expr(...) / block)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["zorder_expr"]


def zorder_expr(col_a, col_b, bits: int = 16,
                min_a: int = 0, min_b: int = 0) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative int
    columns (offsets subtracted first). Returns a long Column whose
    range order follows the Z-curve over (a, b)."""
    a = (F.col(col_a) if isinstance(col_a, str) else col_a).cast("long") \
        - F.lit(min_a)
    b = (F.col(col_b) if isinstance(col_b, str) else col_b).cast("long") \
        - F.lit(min_b)
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(one), 2 * i + 1)
        )
    return z

"""explode — multi-part -> single-part rows (geodataframe.py:1417-1493).

Output mirrors the reference: each part becomes a row; ``index_parts``
adds the part ordinal. Implemented as one Arrow UDF producing
array<binary> of parts + posexplode — partition-local, no shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def explode(df: DataFrame, geom: str = "geometry",
            index_parts: bool = False) -> DataFrame:
    @pandas_udf("array<binary>")
    def _parts(s: pd.Series) -> pd.Series:
        from ..geom import wkb as B
        from ..geom.transforms import get_parts

        batch = B.from_wkb(s)
        parts, gi, pi = get_parts(batch)
        wkbs = B.to_wkb(parts)
        out = []
        pos = 0
        import numpy as np

        counts = np.bincount(gi, minlength=len(s))
        for g in range(len(s)):
            out.append([wkbs[pos + k] for k in range(counts[g])])
            pos += counts[g]
        return pd.Series(out)

    exploded = df.withColumn("__parts", _parts(F.col(geom)))
    other = [c for c in df.columns if c != geom]
    out = exploded.select(
        *other, F.posexplode_outer("__parts").alias("part_index", geom)
    )
    if not index_parts:
        out = out.drop("part_index")
    return out

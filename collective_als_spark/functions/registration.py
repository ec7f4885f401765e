"""User-function registration surface: scalar pandas UDFs, grouped
UDAFs, and Python UDTFs exposed to SQL.

The reference's only user functions are internal (checkedCast at
``CollectiveALS.scala:85-92``, the predict dot product at
``CollectiveALSModel.scala:54-60``) — both rebuilt here as native
column expressions. This module is the *extension* surface an engine
replacement needs: users register their own functions once per session
and call them from SQL.

Performance stance: everything registered here is Arrow-batched
(pandas UDF / UDTF), never row-at-a-time Python; built-in expressions
remain the first choice — this path exists for logic Spark genuinely
cannot express (custom science code, model featurizers).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def register_engine_functions(spark: SparkSession) -> list[str]:
    """Register the engine's SQL-callable function pack; returns names.

    - ``geomean(x)``        grouped/window aggregate, Arrow-batched
    - ``vec_cosine(a, b)``  scalar pandas UDF over array<double> pairs
    - ``explode_ngrams(text, n)`` UDTF: one row per word n-gram
    """

    @F.pandas_udf("double")
    def geomean(v: pd.Series) -> float:  # UDAF via pandas agg UDF
        x = v.dropna()
        if len(x) == 0 or (x <= 0).any():
            return float("nan")
        return float(np.exp(np.log(x.to_numpy()).mean()))

    spark.udf.register("geomean", geomean)

    @F.pandas_udf("double")
    def vec_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.stack(a.values).astype(np.float64)
        B = np.stack(b.values).astype(np.float64)
        num = (A * B).sum(axis=1)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(np.where(den > 0, num / np.maximum(den, 1e-300), np.nan))

    spark.udf.register("vec_cosine", vec_cosine)

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, ngram: string")
    class ExplodeNgrams:
        def eval(self, text: str, n: int):
            if text is None:
                return
            ws = text.split(" ")
            for i in range(max(len(ws) - n + 1, 0)):
                yield i, " ".join(ws[i : i + n])

    spark.udtf.register("explode_ngrams", ExplodeNgrams)
    return ["geomean", "vec_cosine", "explode_ngrams"]

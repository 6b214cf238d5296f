"""UDF / UDAF / UDTF surface (SURVEY §2.J).

These operators deliberately exercise the Python execution boundary (Arrow
batches, grouped-map, table functions) — the escape hatch the engine uses
when built-ins can't express a semantic. Everything here is SMALL on
purpose; hot paths elsewhere stay JVM-side.

Scale notes: pandas UDFs move Arrow batches executor↔Python worker —
~10-100× faster than row-at-a-time UDFs; `udf_python` exists to cover the
row-scalar API, and the identical logic in `udf_pandas_scalar` is the form
you'd actually deploy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.stable import dround, dround_sql
from ..io import load_table
from ..registry import query

# Knuth multiplicative hash — deterministic, no RNG (SURVEY §7.4.8), and
# trivially mirrored in ANSI SQL for the oracle.
_KNUTH = 2654435761
_BUCKETS = 16

_BUCKET_SQL = f"(c_custkey * {_KNUTH}) % 4294967296 % {_BUCKETS}"


@query(
    "udf_python",
    oracle=f"""
SELECT {_BUCKET_SQL} AS bucket, COUNT(*) AS n
FROM customer
GROUP BY 1
""",
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-scalar Python UDF (deterministic multiplicative-hash bucketing),
    verified against the same arithmetic in pure SQL."""

    @F.udf(returnType=LongType(), useArrow=False)
    def bucket_of(key: int) -> int:
        return (key * _KNUTH) % (1 << 32) % _BUCKETS

    c = load_table(spark, sf_dir, "customer")
    return c.select(bucket_of("c_custkey").alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "udf_pandas_scalar",
    oracle=f"""
SELECT {_BUCKET_SQL} AS bucket, COUNT(*) AS n
FROM customer
GROUP BY 1
""",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same bucketing as a vectorized Arrow pandas UDF — the form that
    belongs in a hot path if Python is unavoidable."""

    @F.pandas_udf(LongType())
    def bucket_of(key: pd.Series) -> pd.Series:
        return (key * _KNUTH) % (1 << 32) % _BUCKETS

    c = load_table(spark, sf_dir, "customer")
    return c.select(bucket_of("c_custkey").alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "udaf_pandas_grouped",
    oracle=f"""
SELECT
  l_returnflag,
  {dround_sql('exp(avg(ln(l_quantity)))', 4)} AS geo_mean_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate (geometric mean of quantity) as a GROUPED_AGG
    pandas UDF ↔ DuckDB exp(avg(ln(x))). Rounded to 4 dp: numpy's pairwise
    summation of the logs differs from DuckDB's accumulation at ~1e-13."""
    import numpy as np

    @F.pandas_udf(DoubleType())
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        dround(geo_mean("l_quantity"), 4).alias("geo_mean_qty")
    )


@query(
    "udf_grouped_map",
    oracle="""
SELECT
  c_custkey,
  c_mktsegment,
  CAST(ROUND(CAST(CAST(
    (c_acctbal - avg(c_acctbal) OVER seg) / stddev_samp(c_acctbal) OVER seg
  AS DOUBLE) AS DECIMAL(28,6)), 4) AS DOUBLE) AS acctbal_z
FROM customer
WINDOW seg AS (PARTITION BY c_mktsegment)
""",
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization via applyInPandas (grouped map) —
    the canonical per-entity normalization a feature pipeline runs.
    ↔ DuckDB window mean/stddev; 4 dp absorbs numpy-vs-DuckDB ULPs."""
    schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_mktsegment", StringType()),
            StructField("acctbal_z", DoubleType()),
        ]
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf["c_acctbal"].mean()
        s = pdf["c_acctbal"].std(ddof=1)
        # single-row group: std(ddof=1) is NaN while the oracle's
        # stddev_samp is NULL — map non-finite to None so both render NULL
        z = (pdf["c_acctbal"] - m) / s
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                # no numpy .round here: it rounds half-even; the dround
                # below is the single (half-up, decimal-space) rounding
                "acctbal_z": z.where(np.isfinite(z), None),
            }
        )

    c = load_table(spark, sf_dir, "customer")
    out = c.groupBy("c_mktsegment").applyInPandas(zscore, schema)
    return out.select("c_custkey", "c_mktsegment", dround("acctbal_z", 4).alias("acctbal_z"))


@query(
    "udtf_python",
    oracle="""
SELECT r_name, unnest(generate_series(0, r_regionkey)) AS seq_i
FROM region
""",
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): expand each region row into r_regionkey+1
    rows ↔ DuckDB generate_series lateral join."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="r_name string, seq_i int")
    class ExpandRegion:
        def eval(self, name: str, key: int):
            for i in range(key + 1):
                yield name, i

    spark.udtf.register("expand_region", ExpandRegion)
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region_udtf_src")
    return spark.sql(
        "SELECT e.r_name, e.seq_i "
        "FROM region_udtf_src r, LATERAL expand_region(r.r_name, r.r_regionkey) e"
    )


@query(
    "udf_arrow_optimized",
    oracle=f"""
SELECT {_BUCKET_SQL} AS bucket, COUNT(*) AS n
FROM customer
GROUP BY 1
""",
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Arrow-optimized Python UDF (``useArrow=True``): same scalar
    signature as ``udf_python`` but batched over Arrow instead of pickled
    row-at-a-time — the drop-in migration path that removes most of the
    classic Python-UDF serialization tax. Same SQL oracle as the row UDF,
    so any semantic drift between the two execution paths breaks parity."""

    @F.udf(returnType=LongType(), useArrow=True)
    def bucket_of(key: int) -> int:
        return (key * _KNUTH) % (1 << 32) % _BUCKETS

    c = load_table(spark, sf_dir, "customer")
    return c.select(bucket_of("c_custkey").alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n")
    )

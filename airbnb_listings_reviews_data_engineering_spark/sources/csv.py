"""CSV source/sink.

Reference: pd.read_csv with inferred dtypes (Airbnb_Listings_ETL.py:23;
Latin-1 read at Airbnb_Review_ETL.py:22) and df.to_csv result sinks
(Airbnb_Analysis.py:65 etc.). Here: schema-checked reads (an inference
pass over 100 TB is a full extra scan) and partitioned writes (a
coalesce(1) CSV sink would serialize the job through one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    encoding: str = "UTF-8",
) -> DataFrame:
    return spark.read.csv(path, header=header, schema=schema, encoding=encoding)


def write_csv(df: DataFrame, path: str, header: bool = True, encoding: str = "UTF-8") -> None:
    (
        df.write.mode("overwrite")
        .option("header", header)
        .option("encoding", encoding)
        .csv(path)
    )

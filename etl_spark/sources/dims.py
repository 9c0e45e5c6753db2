"""Dimension sideloading + broadcast enrichment.

Generalizes the reference's static reference-dim pattern (region/passage
tables parsed from GeoJSON at the edge and joined against facts; SURVEY §1.1
"Static reference dims", §2.1 S5, §2.3 J6; reference
src/convert_region_geojson.py:37-53). Dims are small by definition, so every
join here is a broadcast: zero shuffle on the fact side regardless of fact
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Built-in dim: language -> ecosystem/runtime (the CDC analog of the
# reference's region polygons — a small curated lookup joined to every fact).
LANG_ECOSYSTEM_ROWS = [
    ("python", "pypi", "cpython"),
    ("rust", "crates", "rustc"),
    ("go", "gomod", "go"),
    ("cpp", "conan", "llvm"),
    ("c", "conan", "llvm"),
    ("javascript", "npm", "v8"),
    ("typescript", "npm", "v8"),
    ("java", "maven", "jvm"),
    ("markdown", "docs", "none"),
    ("text", "docs", "none"),
    ("unknown", "unknown", "none"),
]
LANG_ECOSYSTEM_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType(), False),
        T.StructField("ecosystem", T.StringType(), False),
        T.StructField("runtime", T.StringType(), False),
    ]
)


def lang_ecosystem_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(LANG_ECOSYSTEM_ROWS, LANG_ECOSYSTEM_SCHEMA)


def load_json_dim(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Load a small dimension from JSON(-lines) — S5 generalized.

    Schema inference is acceptable here precisely because dims are small;
    facts always use explicit schemas (pipeline._read_segments).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def broadcast_enrich(
    facts: DataFrame, dim: DataFrame, on: str | list[str], how: str = "left"
) -> DataFrame:
    """Join a fact stream against a dim with an explicit broadcast hint.

    The hint matters at scale: without it, a cold or mis-estimated dim can
    fall back to a sort-merge join and shuffle the whole fact table
    (the reference's star join relies on the same property, J6;
    mat_points_view.py:41-46).
    """
    return facts.join(F.broadcast(dim), on=on, how=how)

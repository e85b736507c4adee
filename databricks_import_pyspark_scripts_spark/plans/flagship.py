"""Flagship query: the reference's canary event-shaping transformation
(/root/reference/unload_databricks_data_to_s3.py:411) re-expressed over the
``events`` testdata table — projection with aliases, unix_millis, nested
named_struct construction, an array literal — run through the real unload
view-registration path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.registry import register_views

FLAGSHIP_SQL = """
    SELECT unix_millis(ts)                             AS time,
           user_id,
           event_type,
           named_struct('value', value,
                        'prop_k', CAST(get_json_object(props, '$.k') AS BIGINT))
                                                       AS user_properties,
           named_struct('group_A', ARRAY('group_B'))   AS groups,
           named_struct('group_B', named_struct('prop_A', ARRAY('value_A')))
                                                       AS group_properties
    FROM events
"""


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register views under original table names (no textual SQL rewrite)
    and run the canary-shaped transform through spark.sql — the same Q1
    delegation path the unload pipeline uses."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(FLAGSHIP_SQL)

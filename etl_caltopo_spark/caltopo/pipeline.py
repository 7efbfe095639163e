"""End-to-end CalTopo pipeline composition (ref task.ts:63-160).

fetch → decode → split folders → drop null geometry → transform →
folder join.  Everything between fetch and sink is one lazy DataFrame
chain: Catalyst fuses the filters and projections into a single
codegen stage, and the folder join is an explicit broadcast — the
whole pipeline runs without a fact-side shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_caltopo_spark.caltopo.decode import decode_envelope
from etl_caltopo_spark.caltopo.source import Fetcher, fetch_envelopes, validate_env
from etl_caltopo_spark.caltopo.transform import (
    attach_folder_paths,
    drop_null_geometry,
    split_folders,
    to_input_features,
)


def run_pipeline(envelopes: DataFrame) -> DataFrame:
    """Envelope JSON rows → transformed InputFeature rows."""
    features = decode_envelope(envelopes)
    folders, rest = split_folders(features)
    alive = drop_null_geometry(rest)
    shaped = to_input_features(alive)
    return attach_folder_paths(shaped, folders)


def run_from_api(
    spark: SparkSession,
    env: dict,
    since: int = -500,
    fetcher: Fetcher | None = None,
) -> DataFrame:
    """The reference's control() flow (task.ts:63-160): validate env,
    fetch the map delta, run the transform pipeline.  The default sink
    is sink.submit (size-dispatched driver/executor POST); parquet is
    the archive path."""
    cfg = validate_env(env)
    envelopes = fetch_envelopes(spark, [cfg["ShareId"]], since, fetcher)
    return run_pipeline(envelopes)

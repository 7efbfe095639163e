"""Typed-decode enforcement (ref task.ts:71-88 throws on mismatch).

from_json FAILFAST alone only rejects malformed JSON; the strict guard
must also reject well-formed JSON that misses the envelope shape.
"""

from __future__ import annotations

import pytest

from etl_caltopo_spark.caltopo.decode import decode_envelope
from etl_caltopo_spark.caltopo.fixtures import fixture_envelope_df


def _env_df(spark, body: str):
    return spark.createDataFrame([("s", body)], "share_id string, body_json string")


def test_valid_envelope_decodes_all_features(spark):
    assert decode_envelope(fixture_envelope_df(spark)).count() == 16


def test_schema_mismatch_raises_in_strict_mode(spark):
    with pytest.raises(Exception, match="envelope failed schema validation"):
        decode_envelope(_env_df(spark, '{"status": 7}')).collect()


def test_malformed_json_raises(spark):
    with pytest.raises(Exception):
        decode_envelope(_env_df(spark, "not json")).collect()


def test_permissive_mode_drops_bad_envelopes(spark):
    assert decode_envelope(_env_df(spark, '{"status": 7}'), strict=False).count() == 0

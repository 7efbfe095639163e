"""Schema introspection — the Capabilities API (R17, ref task.ts:48-61).

The reference returns its input (Env) or output (feature properties)
JSON schema by ``(SchemaType, DataFlowType)`` so the CloudTAK UI can
render config forms (CHANGELOG.md:54-56).  The engine exposes the same
introspection over its StructTypes, for every pipeline stage.
"""

from __future__ import annotations

from pyspark.sql.types import StructType

from etl_caltopo_spark.caltopo.schemas import (
    ENV_SCHEMA,
    ENVELOPE_SCHEMA,
    FEATURE_SCHEMA,
    OUTPUT_PROPERTIES_SCHEMA,
)


def schema(schema_type: str, flow: str = "incoming") -> StructType:
    """``schema('input'|'output', 'incoming')`` — the reference's
    dispatch (task.ts:50-60); unknown combinations return an empty
    struct exactly like the reference's ``{}`` fallback."""
    if flow == "incoming":
        if schema_type == "input":
            return ENV_SCHEMA
        if schema_type == "output":
            return OUTPUT_PROPERTIES_SCHEMA
    return StructType([])


#: per-stage schemas, introspectable like the reference's Capabilities
STAGE_SCHEMAS: dict[str, StructType] = {
    "env": ENV_SCHEMA,
    "envelope": ENVELOPE_SCHEMA,
    "feature": FEATURE_SCHEMA,
    "output_properties": OUTPUT_PROPERTIES_SCHEMA,
}


def schema_json(schema_type: str, flow: str = "incoming") -> str:
    return schema(schema_type, flow).json()

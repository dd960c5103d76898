"""The flagship document schema (SURVEY.md §7 M1) over the interleaved
docs table ``(doc_id, spans)``.

Mirrors the reference's "complex validator" role: one schema exercising
Enum, Pattern (start-anchored), Range, Nullable, NonNullable, Object,
HomogeneousSequence and a cross-field ColumnCondition, validated both by
the row kernel and the lowered Spark plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import core as V
from .functions import ColumnCondition

MEDIA_REF_PATTERN = r"media://[a-z0-9]{8}/[0-9]{1,4}$"
DOC_ID_PATTERN = r"doc-\d{12}$"
SPAN_KINDS = ["text", "image", "audio", "video", "table"]


# The interleaving invariant, as two 2-field conditions (text spans carry
# text and no media_ref; media spans the reverse). Split on purpose: each
# reads ≤2 struct fields, so both lower to the struct-of-arrays zip_with
# fast path (plans/lowering.py::_soa_forall) instead of interpreted
# per-element struct access.


def _span_text_consistency_py(span) -> bool:
    return (span.get("text") is not None) == (span["kind"] == "text")


def _span_media_consistency_py(span) -> bool:
    return (span.get("media_ref") is not None) == (span["kind"] != "text")


span_text_consistency = ColumnCondition(
    _span_text_consistency_py,
    lambda col: col.getField("text").isNotNull()
    == (col.getField("kind") == F.lit("text")),
    name="span_text_consistency",
    soa_fields=("kind", "text"),
    soa_predicate=lambda k, t: t.isNotNull() == (k == F.lit("text")),
)

span_media_consistency = ColumnCondition(
    _span_media_consistency_py,
    lambda col: col.getField("media_ref").isNotNull()
    == (col.getField("kind") != F.lit("text")),
    name="span_media_consistency",
    soa_fields=("kind", "media_ref"),
    soa_predicate=lambda k, m: m.isNotNull() == (k != F.lit("text")),
)


def span_schema() -> V.Validator:
    return V.AllOf(
        V.Object(
            optional={
                "text": V.Nullable("string"),
                "media_ref": V.Nullable(V.Pattern(MEDIA_REF_PATTERN)),
            },
            required={
                "kind": V.Enum(SPAN_KINDS),
                "offset": V.Range("integer", min_value=0),
            },
        ),
        span_text_consistency,
        span_media_consistency,
    )


def doc_schema() -> V.Validator:
    return V.parse(
        {
            "+doc_id": V.Pattern(DOC_ID_PATTERN),
            "+spans": V.HomogeneousSequence(span_schema(), min_length=1),
        }
    )

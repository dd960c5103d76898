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


def _span_media_consistency_py(span) -> bool:
    """text spans carry text and no media_ref; media spans the reverse."""
    is_text = span["kind"] == "text"
    has_text = span.get("text") is not None
    has_media = span.get("media_ref") is not None
    return (has_text, has_media) == (is_text, not is_text)


def _span_media_consistency_col(col):
    is_text = col.getField("kind") == F.lit("text")
    has_text = col.getField("text").isNotNull()
    has_media = col.getField("media_ref").isNotNull()
    return (has_text == is_text) & (has_media == ~is_text)


span_media_consistency = ColumnCondition(
    _span_media_consistency_py,
    _span_media_consistency_col,
    name="span_media_consistency",
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
        span_media_consistency,
    )


def doc_schema() -> V.Validator:
    return V.parse(
        {
            "+doc_id": V.Pattern(DOC_ID_PATTERN),
            "+spans": V.HomogeneousSequence(span_schema(), min_length=1),
        }
    )

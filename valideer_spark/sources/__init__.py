from .docs import DOCS_SCHEMA, synth_docs, synth_docs_sql, synth_media_catalog
from .tables import load_table, sf_dir

__all__ = [
    "DOCS_SCHEMA",
    "synth_docs",
    "synth_docs_sql",
    "synth_media_catalog",
    "load_table",
    "sf_dir",
]

"""Small Arrow batch utilities.

``strip_md`` exists because pyarrow Schemas carrying the ``b'pandas'``
metadata blob are UNHASHABLE (``hash(schema)`` raises "unhashable
type: 'dict'"), which defeats Ray Data's block-schema deduplication in
``unify_schemas`` and spams "Failed to hash the schemas" warnings on
every block.  Both ``read_parquet`` (files written by pandas) and
``pa.Table.from_pandas`` attach that blob, so batch functions should
route through these helpers.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def strip_md(t: pa.Table) -> pa.Table:
    """Drop schema-level metadata (zero-copy) so schemas stay hashable."""
    if t.schema.metadata:
        return t.replace_schema_metadata(None)
    return t


def table_from_pandas(df: pd.DataFrame) -> pa.Table:
    """``pa.Table.from_pandas`` without the index and without the
    unhashable ``b'pandas'`` schema metadata."""
    return strip_md(pa.Table.from_pandas(df, preserve_index=False))

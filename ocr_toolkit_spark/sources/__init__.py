"""Source/sink surface (the table-IO seam re-exported as a namespace).

Batch reads/writes live in `ocr_toolkit_spark.io` (Parquet now, Iceberg when
a catalog is available); the streaming source lives in
`ocr_toolkit_spark.streaming.stream_extract`. The corpus *builder*
(`fixtures.write_corpus`) replaces the reference's recursive file walk
(/root/reference/ocr_toolkit/utils/file_discovery.py:150-245) — at engine
scale, discovery is a table scan, not a directory walk.
"""

from ..io import (  # noqa: F401
    append_lineage,
    read_documents,
    read_extracted,
    read_lineage,
    write_extracted,
)
from ..streaming.stream_extract import read_documents_stream  # noqa: F401

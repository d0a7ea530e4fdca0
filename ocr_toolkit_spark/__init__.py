"""ocr_toolkit_spark — a PySpark-native main-content extraction engine.

A from-scratch reimplementation of the capabilities of the reference
``Oxidane-bot/ocr-toolkit`` (a single-process CLI document converter) as a
distributed Spark pipeline over tables of interleaved text+media documents:

    documents(doc_id string,
              spans array<struct<kind string, text string, media_ref string, offset int>>)

Design (see docs/SPANS.md for the frozen extraction semantics):

- DataFrame/SQL first; the only Python on the hot path is ONE Arrow-batched
  ``mapInPandas`` stage (``operators/extract.py``) — no per-row Python UDFs.
- Dispatch by content sniffing, not file extension.
- Per-document failure containment: a bad doc yields an error row, never a
  failed task.
- Scale mechanics: salting of oversized docs, AQE, per-partition lineage rows
  and idempotent resume via anti-join (``pipeline.py`` / ``lineage.py``).
"""

__version__ = "0.1.0"

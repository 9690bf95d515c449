"""sapray — a Ray-Data-native CDC / incremental-ingest engine.

A brand-new engine with the query and data-processing capabilities of the
CDAP ``data-integrations/sap`` plugin collection (reference at
``/root/reference``), generalized into a change-data-capture engine over
Parquet tables of source-code repositories, per SURVEY.md.

The reference is a single-task OData batch source
(``src/main/java/io/cdap/plugin/sap/SapODataSource.java:49-52``) whose
record-decode / schema pipeline we re-express as streaming
``ray.data.Dataset`` stages: zero-copy Arrow ``map_batches`` decode,
schema-evolution normalization, hash-partitioned skew-salted shuffle,
stateful LWW merge appliers, and an exactly-once manifest-guarded
Parquet upsert sink.
"""

from sapray.config import CDCConfig
from sapray.pipeline import CDCEngine

__all__ = ["CDCConfig", "CDCEngine"]
__version__ = "0.1.0"

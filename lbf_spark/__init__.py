"""lbf_spark — a from-scratch PySpark-native feature-engineering engine.

Re-expresses the query/data-processing capabilities of the reference
(Isy89/LBF, a single-node fragmentomics feature extractor) as idiomatic
Spark DataFrame plans: point-in-time as-of joins, windowed feature
operators (rolling aggregates, lag/lead, backfill/ffill, sessionize),
flanking-baseline normalization and per-entity summary vectors over an
Iceberg-style table of image+caption pairs — plus the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns).

Nothing in here is ported from the reference's implementation; file:line
citations in docstrings point at the *behavior* being re-expressed.
"""

__version__ = "0.1.0"

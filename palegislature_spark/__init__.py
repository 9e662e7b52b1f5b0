"""palegislature_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference pipeline (progressivity/PALegislature,
surveyed in SURVEY.md) as idiomatic Spark SQL / DataFrame code, plus
the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing, streaming).

Layout:
    session     — tuned SparkSession builder (local + cluster-ready confs)
    schemas     — explicit StructType registry (never infer)
    catalog     — testdata + snowflake table loading / view registration
    functions/  — scalar function library (codecs, names, text, vectors)
    operators/  — composable operators (islands, asof, dedup, ER, merge)
    pipelines/  — the reference's four pipelines re-built Spark-first
    queries/    — the declared query inventory (drives __spark_entry__)
    streaming/  — Structured Streaming windows/watermark operators
"""

__version__ = "0.1.0"

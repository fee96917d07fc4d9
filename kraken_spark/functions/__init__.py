"""Training-data pipeline functions: text analysis, deduplication,
similarity search — first-class components alongside the extraction
operators, all expressed in native Spark SQL expressions (JVM-side,
whole-stage codegen; no Python UDFs in these paths)."""

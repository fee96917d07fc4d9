"""Pure numpy/stdlib kernels — zero Spark imports.

Each module mirrors a capability of the reference pipeline (file:line cites in
module docstrings point into /root/reference for parity checking); all are
plain functions over numpy arrays so they are unit-testable without a
SparkSession and safe to run inside Arrow-batched UDFs.
"""

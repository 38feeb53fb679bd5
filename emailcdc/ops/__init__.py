"""Large-scale training-data pipeline operators.

All hot paths stay JVM-side (built-in pyspark.sql.functions, higher-order
array functions, xxhash64) so they run inside whole-stage codegen; Python
appears only in Arrow-batched pandas UDFs (similarity LSH projection,
multimodal decode plumbing).
"""

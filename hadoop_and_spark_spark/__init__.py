"""hadoop_and_spark_spark — a PySpark-native analytics engine.

Re-expresses the full capability surface of the reference
(UWaterloo CS451 assignment solution set: MapReduce/Spark-RDD query
plans over text, TPC-H, graphs, spam ML, and taxi streams) as
idiomatic PySpark DataFrame / SQL / Structured Streaming programs,
plus large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Design principles (see SURVEY.md §4, §7):
- Declare plans with the DataFrame/SQL API; let Catalyst + AQE pick
  physical strategies (pushdown, pruning, broadcast, partial agg).
- Python UDFs only for the two genuinely non-relational kernels
  (order-sensitive SGD, arbitrary streaming state), always
  Arrow-batched.
- Every operator is a parameterized function (spark, sf_dir, ...)
  -> DataFrame so scale-up is a partitioning/config concern, not a
  code change.
"""

__version__ = "0.1.0"

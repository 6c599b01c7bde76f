"""vector_spark — a PySpark-native log/telemetry pipeline engine.

A from-scratch reimplementation of the *capabilities* of Vector
(Observo-Inc/vector, studied at /root/reference) on Spark DataFrames:
parse -> enrich -> route -> aggregate topologies expressed as declarative
DataFrame plans so Catalyst/Tungsten/AQE pick the physical strategy.

Layout:
  operators/   Vector transform equivalents (route, dedupe, reduce, ...)
  functions/   VRL stdlib subset as Column helpers (parse_*, templates, ...)
  sources/     table readers + deterministic fixture generators
  plans/       topology compiler: dict/YAML spec -> DataFrame DAG
  runtime/     checkpoint/resume, lineage + event/byte counters
  datapipe/    training-data ops: dedup (minhash/simhash), ANN, text quality
  streaming/   Structured Streaming variants of the stateful operators
"""

__version__ = "0.1.0"

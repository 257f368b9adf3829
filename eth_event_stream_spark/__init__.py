"""eth_event_stream_spark — a PySpark-native event-stream analytics engine.

A from-scratch re-expression of the capabilities of the public Rust library
``MszBednarski/eth_event_stream`` (see /root/reference, MIT) on Apache Spark:

- ``functions.schema``  — Solidity event-declaration DSL -> Spark StructType +
  canonical keccak-256 signature (reference: eth_event_macro/src/events.rs).
- ``functions.decode``  — raw log (topics/data) -> typed columns, pure Catalyst
  column expressions (reference: eth_event_macro/src/lib.rs decoder).
- ``operators.sync``    — N-way block-aligned synchronization: min-of-max
  watermark, idempotent dedup, dense per-block flush, total (block, log_index)
  order (reference: eth_event_stream/src/sink.rs).
- ``sources``           — chunked historical + live log sources as Spark batch
  reads and a custom Structured Streaming data source
  (reference: eth_event_stream/src/stream.rs, data_feed/).
- ``streaming``         — stateful reducer API (reference: Sink::reduce_synced_events).
- ``operators.dedup`` / ``similarity`` / ``text`` / ``multimodal`` — the
  large-scale training-data pipeline surface (beyond the reference).

Everything is DataFrame-first: logical plans are declared with the DataFrame/SQL
API and Catalyst/Tungsten pick the physical strategy. Designed for a large
cluster (partition-aligned, shuffle-minimal, broadcast-aware); tested on local.
"""

__version__ = "0.1.0"

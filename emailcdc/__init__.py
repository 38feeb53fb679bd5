"""emailcdc — PySpark-native CDC/incremental-ingest engine.

A from-scratch engine that tails a binlog/WAL-style change-event stream
over an Iceberg-style table of source-code repositories
``(repo, path, commit, lang, content)``, applies the email-extraction
payload of MikeThomsen/nifi-email-extraction-bundle (RFC-5322 address
harvesting, MIME/EML header+body+attachment parsing, iCalendar events)
as vectorized pandas/Arrow UDFs, and MERGE-upserts into a snapshot sink
keyed on ``(repo, path)`` with exactly-once per-batch commit manifests,
checkpointed offsets, additive schema evolution, and skew-aware salted
repartitioning.

Not a port: the reference (a NiFi processor bundle, Java) contributes
payload semantics and test oracles only; the engine is idiomatic Spark.
"""

__version__ = "0.1.0"

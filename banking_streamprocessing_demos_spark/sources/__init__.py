"""Sources: testdata parquet loaders, the deterministic event generator,
streaming rate-source generator, and (optional, gated) Kafka/Avro wiring."""

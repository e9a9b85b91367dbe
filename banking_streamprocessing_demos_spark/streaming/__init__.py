"""Structured Streaming jobs: the stateful undelivered-message detector
(ST1, the reference's specified-but-unimplemented flagship), monitoring
rollups (ST9), and sinks."""

"""Scalar expression helpers (SURVEY §2.8 F-series) — all built-in-only,
JVM-side, whole-stage-codegen friendly. No Python UDFs in the hot path."""

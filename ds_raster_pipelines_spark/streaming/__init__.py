"""Incremental execution: per-partition lineage manifests (checkpoint /
resume) and Structured-Streaming event aggregation."""

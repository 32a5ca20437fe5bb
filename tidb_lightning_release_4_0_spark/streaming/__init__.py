"""Structured Streaming ingest paths (beyond-reference; the closest
reference analog is the server-mode task queue, configlist.go)."""

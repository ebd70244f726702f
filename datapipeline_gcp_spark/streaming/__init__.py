"""Structured Streaming: the event-driven ingestion path (file arrival =
the event) and windowed/stateful aggregations over record streams."""

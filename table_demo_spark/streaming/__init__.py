"""Continuous-query execution: upsert sinks, streaming variants of the
reference queries, and the stateful operators Structured Streaming
lacks natively."""

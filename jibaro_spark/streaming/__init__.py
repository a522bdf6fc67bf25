"""Structured-Streaming pipeline hops and [ext] event-time operators."""

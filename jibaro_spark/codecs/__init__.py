"""Codecs: Confluent wire format, schema conversion, schema registry."""

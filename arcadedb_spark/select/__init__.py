"""Fluent native query API (reference: query/select/Select.java:78)."""

"""Operator layer: ordering, extraction, linking, components, dedup, similarity, text."""

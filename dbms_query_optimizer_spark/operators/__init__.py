"""Operator catalog: relational surface + large-scale pipeline operators."""

"""Composite dataflow operators built from DataFrame primitives."""

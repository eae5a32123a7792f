"""Conformance oracles: reference-semantics reimplementations used as
golden-trace generators (the reference repo ships no tests)."""

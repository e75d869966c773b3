"""Operators: key-aligned set ops, as-of machinery, windowing, resampling.

Each module maps a cluster of reference operators (SURVEY.md §2.3-§2.7)
onto Spark DataFrame transformations.  Shared design rules:

- joins carry explicit broadcast hints where one side is a key spine or
  boundary list (small by construction);
- ordered windows accept a ``by=`` partition list so the same operator
  scales from a single logical series to billions of per-entity series;
- everything stays in Column expressions (whole-stage codegen).
"""

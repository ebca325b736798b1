"""Reference-semantics pipeline operators, Spark-first.

Each module re-expresses one operator family from SURVEY.md §2 as
declarative DataFrame transformations (Catalyst-optimizable, whole-stage
codegen), replacing the reference's driver-side loops and Python-RDD
passes.
"""

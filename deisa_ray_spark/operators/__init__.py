"""Batch operators: the reference's delegated compute surface (SURVEY §2.B)
re-expressed as Catalyst-native DataFrame plans, plus the relational surface
(joins/sorts/set-ops/window functions) that pins Spark's built-ins to the
oracle harness."""

"""Plan inspection utilities — assertions about the physical plans
Catalyst produces (broadcast choices, pushdown, codegen coverage)."""

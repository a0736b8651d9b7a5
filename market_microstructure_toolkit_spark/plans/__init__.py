"""Named query plans + DuckDB oracle SQL for the driver's correctness gate."""

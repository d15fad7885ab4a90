"""Query plans: the SURVEY.md §2 operator inventory expressed over the
driver's synthetic tables, each paired with a DuckDB oracle."""

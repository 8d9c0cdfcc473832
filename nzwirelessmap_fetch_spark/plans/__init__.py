"""Query plans: the flagship point-to-point-links analog and the relational
operator parity suite (SURVEY.md §2.2/§2.3)."""

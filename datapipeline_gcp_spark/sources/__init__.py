"""Sources: landing-file readers (CSV/TSV/snapshot) and seeded synthetic
generators — the engine-side equivalents of SURVEY.md §2.1 S1-S7."""

"""Pipeline plans: the DAG runner and the reference-shaped pipeline."""

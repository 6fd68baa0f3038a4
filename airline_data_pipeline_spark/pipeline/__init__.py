"""Staged batch pipeline replacing the reference's Airflow DAG (SURVEY.md §3.1)."""

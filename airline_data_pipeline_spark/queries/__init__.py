"""Analytical queries: the reference's SQL analytics re-expressed
Spark-first (airline.py) and the driver-oracle suite over the synthetic
star schema (suite.py)."""

"""Spark-level operators: extraction job, checkpoint/resume, dedup,
similarity search, text analysis."""

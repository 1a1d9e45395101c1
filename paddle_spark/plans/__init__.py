"""Session construction + plan inspection helpers."""

from paddle_spark.plans.session import build_session, explain_str

__all__ = ["build_session", "explain_str"]

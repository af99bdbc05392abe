from .audit import audit_plan, formatted_plan  # noqa: F401

from .inspect import explain_str, plan_audit  # noqa: F401

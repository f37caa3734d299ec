from .expectations import (  # noqa: F401
    Expectations,
    QualityGateError,
    not_null_rule,
    range_rule,
    relationship_violations,
    unique_rule,
)

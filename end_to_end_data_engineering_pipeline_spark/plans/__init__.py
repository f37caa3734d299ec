from .models import (  # noqa: F401
    ColumnTest,
    Model,
    ModelRunner,
    not_null,
    relationships,
    unique,
)
from .star import build_dim_date, build_dim_location, build_fact_weather  # noqa: F401

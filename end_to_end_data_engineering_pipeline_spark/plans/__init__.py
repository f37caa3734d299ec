from .models import ModelRunner  # noqa: F401
from .star import build_dim_date, build_dim_location, build_fact_weather  # noqa: F401

from .dedup import dedup_keep_first  # noqa: F401
from .flatten import flatten_payloads  # noqa: F401
from .merge import merge_upsert  # noqa: F401
from .maintenance import (  # noqa: F401
    clustered_write,
    compact_partitions,
    plan_compaction,
)

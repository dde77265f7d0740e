from .merge import (  # noqa: F401
    field_update,
    insert_if_absent,
    keyed_delete,
    merge_upsert,
)
from .diffsync import diff_keys, sync_membership  # noqa: F401
from .windows import (  # noqa: F401
    assign_positions,
    next_position,
    ordered_collect,
)
from .topk import top_k, top_k_per_group  # noqa: F401
from .dedup import dedup_first_seen, exact_dedup  # noqa: F401
from .skew import salted_count_distinct, salted_join  # noqa: F401
from .layout import write_zordered, zorder_key  # noqa: F401
from .partitioning import read_partitioned, write_partitioned  # noqa: F401

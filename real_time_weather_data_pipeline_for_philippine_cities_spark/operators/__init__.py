from .relational import (  # noqa: F401
    dense_ids,
    first_match,
    latest_per_key,
    symmetric_difference,
    topk_per_group,
)

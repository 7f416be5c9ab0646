from .ingest import stream_observations, foreach_batch_pipeline  # noqa: F401
from .windows import windowed_observation_stats  # noqa: F401

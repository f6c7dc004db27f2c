from basd_tpu.data.cache import CachedSource, build_canvas_cache
from basd_tpu.data.sources import (
    HFSource,
    SyntheticSource,
    dataset_info,
    get_channel_stats,
    get_subset_indices,
    make_source,
    source_from_config,
    stats_from_config,
    subset_indices_from_names,
)

__all__ = [
    "CachedSource",
    "HFSource",
    "SyntheticSource",
    "build_canvas_cache",
    "dataset_info",
    "get_channel_stats",
    "get_subset_indices",
    "make_source",
    "source_from_config",
    "stats_from_config",
    "subset_indices_from_names",
]

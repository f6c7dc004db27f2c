from basd_tpu.data.sources import (
    HFSource,
    SyntheticSource,
    dataset_info,
    get_channel_stats,
    get_subset_indices,
    make_source,
)

__all__ = [
    "HFSource",
    "SyntheticSource",
    "dataset_info",
    "get_channel_stats",
    "get_subset_indices",
    "make_source",
]

from basd_tpu.losses.combined import (
    BASDLossConfig,
    basd_loss,
    extraction_layers,
    init_basd_loss,
)
from basd_tpu.losses.selector import (
    SelectorConfig,
    init_selector,
    select_and_mix,
    temperatures,
)

__all__ = [
    "BASDLossConfig",
    "SelectorConfig",
    "basd_loss",
    "extraction_layers",
    "init_basd_loss",
    "init_selector",
    "select_and_mix",
    "temperatures",
]

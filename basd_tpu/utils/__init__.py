from basd_tpu.utils.logging import MetricsLogger, log_kv

__all__ = ["MetricsLogger", "log_kv"]
